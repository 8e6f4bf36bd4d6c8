"""MP4 / ISO-BMFF container metadata parser — stdlib only.

Video corpus pipelines gate on CONTAINER metadata (duration, dimensions,
codec fourcc, track layout) before any frame decode; all of it lives in
the ISO base-media box structure (ISO/IEC 14496-12, public), parseable
without a codec library: a box is ``[size:4][type:4][payload]``, sizes
1/0 meaning 64-bit / to-end-of-file, containers nest.  ``moov/mvhd``
carries the presentation timescale + duration; each ``trak`` carries
``tkhd`` (dimensions) and ``mdia/hdlr`` (vide/soun) + ``mdia/mdhd``
(media timescale/duration/language) + ``stbl/stsd`` (sample-entry
fourcc, e.g. avc1/hvc1/mp4a).

Frame decode (H.264/H.265/AAC) needs codec libraries and stays behind
``fake=True`` in :func:`..multimodal.frame_sample`.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            payload = pos + 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos
            payload = pos + 8
        else:
            payload = pos + 8
        if size < 8 or pos + size > end:
            return  # corrupt size: stop cleanly
        yield btype, payload, pos + size
        pos += size


def parse_mp4(blob: bytes) -> dict:
    """Walk the box tree; duration, dimensions and per-track codec info.
    Raises ValueError when the bytes are not an ISO-BMFF file."""
    top = list(_boxes(blob, 0, len(blob)))
    if not any(t == b"ftyp" for t, _s, _e in top) and not any(
        t == b"moov" for t, _s, _e in top
    ):
        raise ValueError("MP4: no ftyp/moov box found")

    out = {
        "duration_ms": None, "timescale": None, "major_brand": None,
        "n_tracks": 0, "width": None, "height": None,
        "video_codec": None, "audio_codec": None,
    }

    def walk(start, end, depth=0):
        if depth > 16:  # hostile nesting: real files are ~5 deep
            return
        for btype, ps, pe in _boxes(blob, start, end):
            if btype == b"ftyp":
                out["major_brand"] = blob[ps : ps + 4].decode("ascii", "replace")
            elif btype == b"mvhd":
                ver = blob[ps]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", blob, ps + 20)
                else:
                    ts, dur = struct.unpack_from(">II", blob, ps + 12)
                out["timescale"] = ts
                if ts:
                    out["duration_ms"] = int(dur * 1000 / ts + 0.5)
            elif btype == b"trak":
                out["n_tracks"] += 1
                walk(ps, pe, depth + 1)
                continue
            elif btype == b"tkhd":
                ver = blob[ps]
                off = ps + (96 if ver == 1 else 84) - 8
                w16, h16 = struct.unpack_from(">II", blob, off)
                w, h = w16 >> 16, h16 >> 16  # 16.16 fixed point
                if w and h and out["width"] is None:
                    out["width"], out["height"] = w, h
            elif btype == b"hdlr":
                handler = blob[ps + 8 : ps + 12]
                walk._handler = handler  # noqa: SLF001 — per-trak scratch
            elif btype == b"stsd":
                n_entries_pos = ps + 4
                if n_entries_pos + 4 <= pe:
                    for etype, _es, _ee in _boxes(blob, ps + 8, pe):
                        fourcc = etype.decode("ascii", "replace")
                        handler = getattr(walk, "_handler", b"")
                        if handler == b"vide" and out["video_codec"] is None:
                            out["video_codec"] = fourcc
                        elif handler == b"soun" and out["audio_codec"] is None:
                            out["audio_codec"] = fourcc
                        break
            if btype in _CONTAINERS:
                walk(ps, pe, depth + 1)

    walk(0, len(blob))
    if out["duration_ms"] is None and out["n_tracks"] == 0:
        raise ValueError("MP4: no moov metadata found")
    return out
