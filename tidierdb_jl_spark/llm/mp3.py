"""MPEG audio (MP3) frame-header metadata parser — stdlib only.

Audio corpus pipelines filter and bucket on CONTAINER metadata (duration,
sample rate, channel count, bitrate, CBR/VBR) long before any sample
decode; those fields live in the 4-byte MPEG audio frame headers, which
are public-spec (ISO/IEC 11172-3 / 13818-3) and parseable without a
codec library.  This walks every frame (header hops — O(n_frames) seeks,
no payload decode), skipping ID3v2 (syncsafe size) and ID3v1 tags, and
sums per-frame samples/sample_rate for an exact duration that is correct
for VBR streams (where header bitrate × file size lies).

Full sample decode (huffman + IMDCT + polyphase filterbank) needs a
codec library and stays behind ``fake=True`` in
:func:`..multimodal.extract_audio_features`.
"""

from __future__ import annotations

__all__ = ["parse_mp3"]

_BITRATES = {
    # (version_group, layer) -> kbps by index 1..14; index 0/15 invalid
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {
    3: [44100, 48000, 32000],   # MPEG1
    2: [22050, 24000, 16000],   # MPEG2
    0: [11025, 12000, 8000],    # MPEG2.5
}


def _frame_header(b: bytes, pos: int):
    """Parse a frame header at ``pos``; returns (frame_len, samples,
    sample_rate, bitrate_kbps, channels) or None if not a valid header."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 0x3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 0x3   # 1=III, 2=II, 3=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    pad = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    if ver == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits
    vgroup = 1 if ver == 3 else 2
    kbps = _BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _RATES[ver][sr_idx]
    if layer == 1:
        samples = 384
        flen = (12 * kbps * 1000 // rate + pad) * 4
    else:
        samples = 1152 if (layer == 2 or ver == 3) else 576
        flen = (samples // 8) * kbps * 1000 // rate + pad
    channels = 1 if mode == 3 else 2
    return flen, samples, rate, kbps, channels


def parse_mp3(blob: bytes) -> dict:
    """Walk all MPEG audio frames; exact duration, average bitrate, VBR
    flag.  Raises ValueError if no valid frame sequence is found."""
    b = blob
    pos = 0
    if b[:3] == b"ID3":  # ID3v2: 10-byte header + syncsafe 28-bit size
        if len(b) < 10:
            raise ValueError("MP3: truncated ID3v2 header")
        size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        pos = 10 + size
    end = len(b)
    if b[-128:-125] == b"TAG":  # ID3v1 trailer
        end -= 128

    n_frames = 0
    total_samples = 0
    rate = channels = None
    kbps_sum = 0
    kbps_set = set()
    while pos < end:
        fh = _frame_header(b, pos)
        if fh is None:
            if n_frames == 0:
                pos += 1  # resync: scan for the first frame
                continue
            break  # trailing garbage after a valid stream
        flen, samples, r, kbps, ch = fh
        if flen <= 0 or pos + flen > end + 4:  # tolerate clipped last frame
            break
        if rate is None:
            rate, channels = r, ch
        n_frames += 1
        total_samples += samples
        kbps_sum += kbps
        kbps_set.add(kbps)
        pos += flen
    if n_frames == 0 or rate is None:
        raise ValueError("MP3: no valid MPEG audio frames found")
    return {
        # half-up (not Python's half-even): matches SQL round(), keeping
        # metadata oracle-comparable across engines
        "duration_ms": int(total_samples * 1000 / rate + 0.5),
        "sample_rate": rate,
        "channels": channels,
        "bitrate_kbps": round(kbps_sum / n_frames, 3),
        "n_frames": n_frames,
        "vbr": len(kbps_set) > 1,
    }
