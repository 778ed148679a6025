"""Struct / Map / wide-decimal container codecs.

Reference parity: map containers (columnar/src/wrap.rs:83-135,
columnar_derive/src/derive/map.rs:7-369), recursive nested rows
(columnar/tests/integration/attribute.rs:555-594), u64::MAX-range values
through i128 arithmetic (fuzz/tests/test.rs:74).
"""

import decimal

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from sparkolumnar.codecs import get_codec
from sparkolumnar.engine.blocks import (arrow_type_from_str,
                                        arrow_type_to_str,
                                        canonical_checksum)
from sparkolumnar.engine.selector import select_encode


def _roundtrip(arr: pa.Array) -> pa.Array:
    ch = select_encode(arr)
    return get_codec(ch.codec).decode(ch.payload, len(arr), arr.type)


STRUCT_T = pa.struct([pa.field("lang", pa.string()),
                      pa.field("n", pa.int64()),
                      pa.field("score", pa.float64())])


def test_struct_roundtrip_with_field_nulls():
    arr = pa.array([{"lang": "en", "n": 5, "score": 0.5},
                    {"lang": None, "n": None, "score": 2.0},
                    {"lang": "en", "n": 7, "score": None}], type=STRUCT_T)
    assert _roundtrip(arr).to_pylist() == arr.to_pylist()


def test_struct_fields_use_real_codecs():
    # a low-cardinality string field inside a struct must still reach
    # dict/rle, not plain — the selector recurses per field
    n = 4000
    arr = pa.array([{"lang": "en" if i % 3 else "fr", "n": i, "score": 1.0}
                    for i in range(n)], type=STRUCT_T)
    ch = select_encode(arr)
    assert ch.codec == "struct"
    raw = sum(b.size for b in arr.buffers() if b is not None)
    assert len(ch.payload) < 0.25 * raw  # per-field compression happened


def test_struct_unknown_field_ignored_missing_nullfilled():
    arr = pa.array([{"lang": "en", "n": 1, "score": 0.0}], type=STRUCT_T)
    ch = select_encode(arr)
    # decode into a schema that drops `n` and adds `extra`
    t2 = pa.struct([pa.field("lang", pa.string()),
                    pa.field("extra", pa.int32())])
    out = get_codec("struct").decode(ch.payload, 1, t2)
    assert out.to_pylist() == [{"lang": "en", "extra": None}]


def test_map_roundtrip():
    mt = pa.map_(pa.string(), pa.int64())
    arr = pa.array([[("a", 1), ("b", 2)], [], [("x", None), ("y", 9)]],
                   type=mt)
    assert _roundtrip(arr).to_pylist() == arr.to_pylist()


def test_recursive_struct_map_list():
    t = pa.struct([
        pa.field("inner", pa.struct([pa.field("x", pa.int32())])),
        pa.field("m", pa.map_(pa.string(), pa.string())),
        pa.field("l", pa.list_(pa.int64())),
    ])
    arr = pa.array([
        {"inner": {"x": 1}, "m": [("k", "v")], "l": [1, 2]},
        {"inner": None, "m": [], "l": None},
        {"inner": {"x": None}, "m": None, "l": []},
    ], type=t)
    assert _roundtrip(arr).to_pylist() == arr.to_pylist()
    assert arrow_type_from_str(arrow_type_to_str(t)) == t


def test_dec128_wide_roundtrip():
    dt = pa.decimal128(38, 10)
    vals = [decimal.Decimal("123456789012345678901234567.8901234567"),
            decimal.Decimal("-99999999999999999999999999.9999999999"),
            decimal.Decimal("-1.0000000001"),
            decimal.Decimal("0"),
            decimal.Decimal("18446744073709551615")]  # u64::MAX
    arr = pa.array(vals, type=dt)
    ch = select_encode(arr)
    assert ch.codec == "dec128"
    out = get_codec("dec128").decode(ch.payload, len(arr), dt)
    assert out.to_pylist() == vals


def test_dec128_small_magnitudes_compress():
    # hi limb is a constant sign-extension run -> near-int64 cost
    dt = pa.decimal128(38, 2)
    arr = pa.array([decimal.Decimal(i) / 100 for i in range(5000)], type=dt)
    ch = select_encode(arr)
    assert len(ch.payload) < 5000 * 4  # far below the 16 B/value raw


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.tuples(st.one_of(st.none(), st.text(max_size=6)),
              st.one_of(st.none(), st.integers(-2**62, 2**62)))),
    max_size=40))
def test_struct_fuzz(rows):
    t = pa.struct([pa.field("s", pa.string()), pa.field("v", pa.int64())])
    pyrows = [None if r is None else {"s": r[0], "v": r[1]} for r in rows]
    arr = pa.array(pyrows, type=t)
    if arr.null_count:  # top-level nulls handled by the engine layer
        arr = arr.drop_null()
    if len(arr) == 0:
        return
    assert _roundtrip(arr).to_pylist() == arr.to_pylist()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.decimals(
    min_value=decimal.Decimal("-" + "9" * 28),
    max_value=decimal.Decimal("9" * 28),
    allow_nan=False, allow_infinity=False, places=6)), max_size=40))
def test_dec128_fuzz(vals):
    dt = pa.decimal128(38, 6)
    arr = pa.array(vals, type=dt).drop_null()
    if len(arr) == 0:
        return
    assert _roundtrip(arr).to_pylist() == arr.to_pylist()
    # checksum is sensitive to values
    assert len(canonical_checksum(arr)) == 64


def test_engine_roundtrip_struct_map_decimal(spark):
    """End-to-end through encode_table/decode_blocks with verify=True
    (recomputed canonical sha256 per column), including top-level nulls."""
    from pyspark.sql import functions as F

    from sparkolumnar.engine import decode_blocks, encode_table

    df = (spark.range(3000)
          .withColumn("meta", F.when(F.col("id") % 7 != 0, F.struct(
              F.concat(F.lit("l"), (F.col("id") % 5).cast("string"))
              .alias("lang"),
              (F.col("id") % 100).alias("n"))))
          .withColumn("hdrs", F.create_map(
              F.lit("host"), F.concat(F.lit("h"), (F.col("id") % 9)
                                      .cast("string")),
              F.lit("path"), F.col("id").cast("string")))
          .withColumn("price", (F.col("id").cast("decimal(38,10)")
                                / F.lit(7).cast("decimal(38,10)"))))
    blocks = encode_table(df, snapshot_id="containers", partitions=4)
    out = decode_blocks(blocks, verify=True)
    assert out.count() == 3000
    a = df.orderBy("id").collect()
    b = out.orderBy("id").collect()
    assert a == b


def test_uint64_roundtrip():
    vals = np.array([0, 1, 2**63, 2**64 - 1, 12345], dtype=np.uint64)
    arr = pa.array(vals, type=pa.uint64())
    ch = select_encode(arr)
    assert ch.codec == "u64"
    out = get_codec("u64").decode(ch.payload, len(arr), pa.uint64())
    assert out.to_pylist() == vals.tolist()
    assert len(canonical_checksum(arr)) == 64
    assert arrow_type_from_str(arrow_type_to_str(pa.uint64())) == pa.uint64()


def test_uint64_sequential_compresses():
    # bit-reinterpreted sequence still delta-RLE collapses
    arr = pa.array(np.arange(2**63, 2**63 + 5000, dtype=np.uint64))
    ch = select_encode(arr)
    assert len(ch.payload) < 200
    out = get_codec("u64").decode(ch.payload, 5000, pa.uint64())
    assert out.to_pylist() == arr.to_pylist()
