"""GOLDEN-BYTES tests for the deletion-vector codec.

The r10 advisor found that the decoder (``sources/dvectors.py``) and the
"independent" test encoder (``tests/roaring_ref.py``) shared the same
divergence from the published serialization — keyless dense buckets and
a doubled Iceberg magic — so their agreement tests could not catch it.
The fix (r11) is verified here against byte sequences HAND-WRITTEN from
the public specs with no code in the loop:

- Delta PROTOCOL.md "Deletion Vector Format" + the RoaringFormatSpec
  64-bit extension (github.com/RoaringBitmap/RoaringFormatSpec):
  4-byte LE magic 1681511377, 8-byte LE count of NON-EMPTY buckets,
  then per bucket a 4-byte LE key + the standard 32-bit bitmap.
- Iceberg v3 spec "Deletion vectors" (Puffin ``deletion-vector-v1``):
  4-byte BE length, the magic bytes D1 D3 39 64 exactly once (== the
  Delta magic little-endian — magic+vector is Delta's serialization
  byte-for-byte), the portable vector, 4-byte BE CRC-32 over
  magic+vector.

Reference parity: the reference reads DV-bearing lakehouse tables
through DuckDB extensions (/root/reference/src/TidierDB.jl:166-169);
this repo decodes the public formats directly, so these bytes are the
contract with real writers (delta-spark, Iceberg Java).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tidierdb_jl_spark.sources.dvectors import (
    decode_dv_blob,
    decode_roaring_array,
    read_iceberg_dv_from_bytes,
)

from roaring_ref import encode_roaring_array, iceberg_dv_blob


# Members {1, 3, 4} in bucket 0 and {7} in bucket 2 — bucket 1 is EMPTY
# and therefore absent (count=2, keys 0 and 2), which is precisely the
# case the old keyless decoder got wrong.
#
# Hand-assembled from the specs, byte by byte:
GOLDEN_MEMBERS = [1, 3, 4, (2 << 32) | 7]
GOLDEN_BYTES = bytes(
    [0xD1, 0xD3, 0x39, 0x64]            # magic 1681511377 LE
    + [2, 0, 0, 0, 0, 0, 0, 0]          # bucket count = 2 (LE int64)
    + [0, 0, 0, 0]                      # bucket key 0 (LE uint32)
    #   standard 32-bit bitmap for {1, 3, 4}:
    + [0x3A, 0x30, 0, 0]                # cookie 12346 (no runs)
    + [1, 0, 0, 0]                      # container count = 1
    + [0, 0, 2, 0]                      # key 0, cardinality-1 = 2
    + [16, 0, 0, 0]                     # offset: 4+4+4+4 = 16
    + [1, 0, 3, 0, 4, 0]                # array container: 1, 3, 4
    + [2, 0, 0, 0]                      # bucket key 2 (LE uint32)
    #   standard 32-bit bitmap for {7}:
    + [0x3A, 0x30, 0, 0]
    + [1, 0, 0, 0]
    + [0, 0, 0, 0]                      # key 0, cardinality-1 = 0
    + [16, 0, 0, 0]
    + [7, 0]                            # array container: 7
)


def test_decoder_reads_hand_written_spec_bytes():
    out = decode_roaring_array(GOLDEN_BYTES)
    assert out.tolist() == GOLDEN_MEMBERS


def test_test_encoder_emits_exactly_the_spec_bytes():
    # the "independent encoder" must now be byte-identical to the spec
    assert encode_roaring_array(GOLDEN_MEMBERS) == GOLDEN_BYTES


def test_iceberg_blob_golden_framing():
    body = GOLDEN_BYTES  # magic+vector == Delta serialization (interop)
    blob = (struct.pack(">i", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
    assert iceberg_dv_blob(GOLDEN_MEMBERS) == blob
    out = read_iceberg_dv_from_bytes(blob, 0, len(blob),
                                     cardinality=len(GOLDEN_MEMBERS))
    assert out.tolist() == GOLDEN_MEMBERS


def test_doubled_magic_is_refused():
    # the exact shape of the old bug: magic appearing twice in a blob
    body = bytes([0xD1, 0xD3, 0x39, 0x64]) + GOLDEN_BYTES
    blob = (struct.pack(">i", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))
    with pytest.raises(ValueError):
        read_iceberg_dv_from_bytes(blob, 0, len(blob))


def test_keyless_dense_layout_is_refused():
    # the old (wrong) on-disk shape — bitmaps for buckets 0..n-1 with no
    # keys — must no longer decode silently
    rb32 = GOLDEN_BYTES[24:46]  # the {1,3,4} bitmap without its key
    legacy = GOLDEN_BYTES[:4] + struct.pack("<q", 1) + rb32
    with pytest.raises(ValueError):
        decode_roaring_array(legacy)


def test_out_of_order_keys_refused():
    b01 = encode_roaring_array([5, (1 << 32) | 9])
    # swap the two equal-length (key, bitmap) sections: key1 before key0
    mid = 12 + (len(b01) - 12) // 2
    swapped = b01[:12] + b01[mid:] + b01[12:mid]
    with pytest.raises(ValueError, match="strictly greater"):
        decode_roaring_array(swapped)


def test_trailing_bytes_refused():
    with pytest.raises(ValueError, match="trailing"):
        decode_roaring_array(GOLDEN_BYTES + b"\x00")


def test_sparse_buckets_roundtrip():
    # large bucket gaps — keys 0, 5, 70000 — exercise key-addressed
    # (not index-addressed) bucket resolution
    members = [0, 1, (5 << 32) | 123, (70000 << 32) | 65535]
    out = decode_dv_blob(encode_roaring_array(members), len(members))
    assert out.tolist() == members


def test_bitmap_container_roundtrip():
    # >4096 members in one 16-bit container forces the bitmap container
    vals = list(range(0, 10000, 2))  # 5000 members, key 0, container 0
    out = decode_roaring_array(encode_roaring_array(vals))
    assert out.tolist() == vals


def test_run_container_roundtrip_with_keys():
    members = [(3 << 32) | v for v in range(100, 200)]
    out = decode_roaring_array(
        encode_roaring_array(members, force_run=True))
    assert out.tolist() == members


def test_empty_vector():
    assert decode_roaring_array(encode_roaring_array([])).size == 0


def test_differential_random_roundtrip():
    rng = np.random.RandomState(11)
    for _ in range(20):
        n_buckets = rng.randint(1, 4)
        keys = sorted(rng.choice(100, size=n_buckets, replace=False))
        members = sorted(
            int(k) << 32 | int(v)
            for k in keys
            for v in rng.choice(1 << 20, size=rng.randint(1, 50),
                                replace=False)
        )
        out = decode_dv_blob(encode_roaring_array(members), len(members))
        assert out.tolist() == members


def test_fuzz_container_type_boundaries():
    """Seeded fuzz across the container-type decision points the random
    roundtrip above never reaches: array/bitmap flip at cardinality
    4096/4097, dense runs, many 16-bit containers per bucket (offset
    table present: size >= 4), and sparse bucket keys — every shape a
    real writer emits at 100 TB delete volumes."""
    rng = np.random.RandomState(1681511377 % (1 << 31))
    for trial in range(12):
        members = []
        keys = sorted(rng.choice(1 << 20, size=rng.randint(1, 4),
                                 replace=False))
        for k in keys:
            vals: set[int] = set()
            # 4-9 containers per bucket => offset table exercised
            for ci in range(rng.randint(4, 10)):
                base = int(rng.randint(0, 1 << 16)) << 16
                kind = rng.randint(0, 4)
                if kind == 0:    # small array container
                    n = rng.randint(1, 64)
                    lows = rng.choice(1 << 16, size=n, replace=False)
                elif kind == 1:  # boundary cardinalities 4095..4097
                    n = 4095 + rng.randint(0, 3)
                    lows = rng.choice(1 << 16, size=n, replace=False)
                elif kind == 2:  # dense bitmap container
                    n = rng.randint(5000, 9000)
                    lows = rng.choice(1 << 16, size=n, replace=False)
                else:            # contiguous run
                    s = rng.randint(0, 60000)
                    lows = np.arange(s, s + rng.randint(1, 300))
                vals.update(base | int(v) for v in lows)
            members.extend((int(k) << 32) | v for v in sorted(vals))
        members.sort()
        blob = encode_roaring_array(members)
        out = decode_dv_blob(blob, len(members))
        assert out.tolist() == members, f"trial {trial}"
        # and through the Iceberg Puffin framing
        iblob = iceberg_dv_blob(members)
        got = read_iceberg_dv_from_bytes(iblob, 0, len(iblob),
                                         len(members))
        assert got.tolist() == members, f"trial {trial} (puffin)"
