"""murmur3_x86_32 (sources/murmur3.py) — published-vector verification.

Two independent vector sets pin the implementation: the canonical
smhasher reference values, and the Iceberg spec's Appendix-B bucket
hash examples (the values java Iceberg's bucket transform must
produce).  A hypothesis differential checks the vectorized long path
against the scalar reference byte-for-byte."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from tidierdb_jl_spark.sources.murmur3 import murmur3_32, murmur3_32_long_vec


def test_smhasher_reference_vectors():
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") & 0xFFFFFFFF == 0x248BFA47
    assert murmur3_32(
        b"The quick brown fox jumps over the lazy dog"
    ) & 0xFFFFFFFF == 0x2E4FF723


def test_iceberg_appendix_b_vectors():
    """Iceberg spec Appendix B: int and long 34 hash identically (8-byte
    LE long form), string "iceberg" and the fixed/binary example."""
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089
    assert murmur3_32(bytes([0, 1, 2, 3])) == -188683207


def test_bucket_transform_semantics():
    """(hash & Integer.MAX_VALUE) % N — the spec's bucket formula —
    through the writer's transform helper, nulls stay null."""
    import pandas as pd

    from tidierdb_jl_spark.sources.iceberg_writer import _transform_values

    pf = {"transform": "bucket", "param": 16, "ice_type": "long"}
    got = _transform_values(pf, pd.Series([34, None, 0], dtype="object"))
    assert got.iloc[0] == (2017239379 & 0x7FFFFFFF) % 16
    assert got.iloc[1] is None
    spf = {"transform": "bucket", "param": 16, "ice_type": "string"}
    sgot = _transform_values(spf, pd.Series(["iceberg", None]))
    assert sgot.iloc[0] == (1210000089 & 0x7FFFFFFF) % 16
    tpf = {"transform": "truncate", "param": 10, "ice_type": "long"}
    tgot = _transform_values(tpf, pd.Series([34, -7, None], dtype="object"))
    assert tgot.iloc[0] == 30 and tgot.iloc[1] == -10  # floor semantics
    assert tgot.iloc[2] is None
    tsf = {"transform": "truncate", "param": 3, "ice_type": "string"}
    assert _transform_values(tsf, pd.Series(["iceberg"])).iloc[0] == "ice"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_vectorized_long_path_matches_scalar(vals):
    got = murmur3_32_long_vec(vals)
    for v, h in zip(vals, got):
        assert int(h) == murmur3_32(struct.pack("<q", v)), v
