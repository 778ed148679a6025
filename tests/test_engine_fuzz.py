"""End-to-end engine fuzzing: random schemas, values, null patterns and
batch shapes must round-trip bit-exactly through encode_table/decode_blocks
(the reference's fuzz targets re-expressed at the distributed level,
fuzz/fuzz_targets/*)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from sparkolumnar.engine.decode import decode_block_row
from sparkolumnar.engine.encode import encode_batch
import pyarrow as pa

# column generators per type
_GENS = {
    "long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "double": st.floats(allow_nan=False),
    "string": st.text(max_size=24),
    "binary": st.binary(max_size=24),
    "boolean": st.booleans(),
}


@st.composite
def tables(draw):
    n_cols = draw(st.integers(1, 5))
    n_rows = draw(st.integers(0, 60))
    cols = {}
    types = {}
    for i in range(n_cols):
        t = draw(st.sampled_from(sorted(_GENS)))
        nullable = draw(st.booleans())
        vals = [draw(st.none()) if (nullable and draw(st.booleans()))
                else draw(_GENS[t]) for _ in range(n_rows)]
        cols[f"c{i}"] = vals
        types[f"c{i}"] = t
    return cols, types, n_rows


_PA_TYPES = {
    "long": pa.int64(), "int": pa.int32(), "double": pa.float64(),
    "string": pa.string(), "binary": pa.binary(), "boolean": pa.bool_(),
}


@given(tables())
@settings(max_examples=120, deadline=None)
def test_block_roundtrip_fuzz(tbl):
    """Batch-level round-trip (no Spark session needed: the same code the
    UDFs run, over arbitrary arrow batches)."""
    cols, types, n_rows = tbl
    arrays = [pa.array(v, type=_PA_TYPES[types[k]]) for k, v in cols.items()]
    batch = pa.RecordBatch.from_arrays(arrays, names=list(cols))
    block = encode_batch(batch, "fuzz", 0, 0)
    row = block.to_pylist()[0]
    out = decode_block_row(row, verify=True)
    assert out.num_rows == n_rows
    for k in cols:
        assert out.column(out.schema.get_field_index(k)).to_pylist() == cols[k], k


def test_unknown_codec_errors_cleanly():
    from sparkolumnar.codecs import CodecError, get_codec

    batch = pa.RecordBatch.from_arrays([pa.array([1, 2, 3])], names=["x"])
    block = encode_batch(batch, "s", 0, 0)
    row = block.to_pylist()[0]
    row["columns"][0]["codec"] = "codec_from_the_future"
    with pytest.raises(CodecError, match="unknown codec id"):
        decode_block_row(row)


def test_corrupted_payload_fails_verify():
    from sparkolumnar.codecs import CodecError

    batch = pa.RecordBatch.from_arrays(
        [pa.array(["aa", "bb", "cc"] * 10)], names=["s"])
    block = encode_batch(batch, "s", 0, 0)
    row = block.to_pylist()[0]
    p = bytearray(row["p_s"])
    p[-1] ^= 0xFF
    row["p_s"] = bytes(p)
    with pytest.raises(Exception):
        decode_block_row(row, verify=True)


def test_malicious_rle_count_capped():
    """MAX_RLE_COUNT OOM defense (reference strategy/mod.rs:7)."""
    from sparkolumnar import refmodel as rm
    from sparkolumnar.codecs import CodecError
    from sparkolumnar.codecs.rle_family import (bool_rle_decode,
                                                rle_decode_int64)

    evil = rm.svarint_bytes(10**10) + rm.svarint_bytes(1)
    with pytest.raises((CodecError, Exception)):
        rle_decode_int64(bytes(evil), 10**10)
    evil_bool = rm.uvarint(10**10)
    with pytest.raises(CodecError):
        bool_rle_decode(bytes(evil_bool), 10**10)


# ---- container-column fuzz (struct/map/wide-decimal/uint64) ----------------

import decimal as _dec

_STRUCT_T = pa.struct([pa.field("s", pa.string()), pa.field("v", pa.int64())])
_MAP_T = pa.map_(pa.string(), pa.int64())
_DEC_T = pa.decimal128(38, 6)

_CONT_GENS = {
    "struct": st.fixed_dictionaries(
        {"s": st.one_of(st.none(), st.text(max_size=8)),
         "v": st.one_of(st.none(), st.integers(-2**62, 2**62))}),
    "map": st.dictionaries(st.text(max_size=4),
                           st.one_of(st.none(),
                                     st.integers(-2**31, 2**31)),
                           max_size=4).map(lambda d: list(d.items())),
    "dec": st.decimals(min_value=_dec.Decimal("-" + "9" * 28),
                       max_value=_dec.Decimal("9" * 28),
                       allow_nan=False, allow_infinity=False, places=6),
    "u64": st.integers(0, 2**64 - 1),
    "list": st.lists(st.one_of(st.none(), st.integers(-100, 100)),
                     max_size=5),
}

_CONT_PA = {"struct": _STRUCT_T, "map": _MAP_T, "dec": _DEC_T,
            "u64": pa.uint64(), "list": pa.list_(pa.int64())}


@st.composite
def container_tables(draw):
    n_rows = draw(st.integers(0, 50))
    cols, types = {}, {}
    for i in range(draw(st.integers(1, 3))):
        t = draw(st.sampled_from(sorted(_CONT_GENS)))
        nullable = draw(st.booleans())
        vals = [draw(st.none()) if (nullable and draw(st.booleans()))
                else draw(_CONT_GENS[t]) for _ in range(n_rows)]
        cols[f"c{i}"] = vals
        types[f"c{i}"] = t
    budget = draw(st.one_of(st.none(), st.integers(0, n_rows)))
    return cols, types, n_rows, budget


@given(container_tables())
@settings(max_examples=80, deadline=None)
def test_block_roundtrip_fuzz_containers(tbl):
    """Engine-level round-trip for container columns, including a random
    decode budget (partial blocks must be the exact row prefix)."""
    cols, types, n_rows, budget = tbl
    arrays = [pa.array(v, type=_CONT_PA[types[k]]) for k, v in cols.items()]
    batch = pa.RecordBatch.from_arrays(arrays, names=list(cols))
    block = encode_batch(batch, "fuzz_c", 0, 0)
    row = block.to_pylist()[0]
    out = decode_block_row(row, verify=True)
    assert out.num_rows == n_rows
    for k in cols:
        got = out.column(out.schema.get_field_index(k)).to_pylist()
        want = pa.array(cols[k], type=_CONT_PA[types[k]]).to_pylist()
        assert got == want, k
    if budget is not None:
        part = decode_block_row(row, budget=(0, budget))
        assert part.num_rows == budget
        for k in cols:
            got = part.column(part.schema.get_field_index(k)).to_pylist()
            want = pa.array(cols[k],
                            type=_CONT_PA[types[k]]).to_pylist()[:budget]
            assert got == want, k


@given(st.lists(st.one_of(st.none(), st.integers(-2**62, 2**62)),
                min_size=1, max_size=60),
       st.lists(st.one_of(st.none(), st.sampled_from(
           ["en", "de", "fr", "xx", "yy"])), min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_zone_and_bloom_metadata_invariants(ints, langs):
    """Zone bounds must cover every value; the bloom must contain every
    distinct string (no false negatives — pruning soundness)."""
    from sparkolumnar.engine.blocks import bloom_positions

    n = min(len(ints), len(langs))
    ints, langs = ints[:n], langs[:n]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(ints, pa.int64()), pa.array(langs, pa.string())],
        names=["v", "lang"])
    block = encode_batch(batch, "zb", 0, 0)
    meta = {m["name"]: m for m in block.to_pylist()[0]["columns"]}
    vals = [v for v in ints if v is not None]
    if vals:
        assert meta["v"]["min_i64"] == min(vals)
        assert meta["v"]["max_i64"] == max(vals)
    else:
        assert meta["v"]["min_i64"] is None
    bloom = meta["lang"]["bloom"]
    present = {s for s in langs if s is not None}
    if bloom is not None and present:
        words = [w & ((1 << 64) - 1) for w in bloom]
        for s in present:
            for pos in bloom_positions(s.encode()):
                assert (words[pos // 64] >> (pos % 64)) & 1, (s, pos)
