"""Schema evolution (forward/backward compat) and per-column codec
overrides — the reference's indexed-optional-column and strategy-attribute
features re-expressed (compatible.rs:23-166, args.rs:53-76)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from sparkolumnar.engine import decode_blocks, encode_table


@pytest.fixture(scope="module")
def small_df(spark):
    pdf = pd.DataFrame({
        "k": list(range(200)),
        "v": [i % 7 for i in range(200)],
        "s": [f"s{i % 5}" for i in range(200)],
    })
    return spark.createDataFrame(pdf)


def test_forward_compat_unknown_column_ignored(spark, small_df):
    """Reader with an older schema (no 's') decodes blocks that carry it."""
    blocks = encode_table(small_df, snapshot_id="c1")
    old_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    out = decode_blocks(blocks, schema=old_schema, compat=True)
    assert out.columns == ["k", "v"]
    assert out.count() == 200
    assert out.agg(F.sum("k")).collect()[0][0] == sum(range(200))


def test_backward_compat_missing_column_null_filled(spark, small_df):
    """Reader with a newer schema (extra 'extra') gets nulls for it."""
    blocks = encode_table(small_df, snapshot_id="c2")
    new_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("extra", T.DoubleType()),
    ])
    out = decode_blocks(blocks, schema=new_schema, compat=True)
    rows = out.orderBy("k").collect()
    assert len(rows) == 200
    assert rows[3]["s"] == "s3"
    assert all(r["extra"] is None for r in rows)


def test_mixed_generation_table_compat_read(spark, tmp_path):
    """A table whose blocks span TWO schema generations (streaming schema
    evolution: later snapshots carry an extra column) reads end-to-end with
    compat=True against the current schema — requires read_blocks to merge
    parquet footers so the newer generation's payload fields survive the
    scan, then per-block null-fill for the older generation."""
    from sparkolumnar.engine.tableio import TableIO

    io = TableIO(spark, str(tmp_path / "evo"))
    d1 = spark.createDataFrame(pd.DataFrame(
        {"k": range(10), "a": ["x"] * 10}))
    d2 = spark.createDataFrame(pd.DataFrame(
        {"k": range(10, 20), "a": ["y"] * 10, "b": list(range(10))}))
    io.write_blocks(encode_table(d1, snapshot_id="g1", partitions=1))
    io.write_blocks(encode_table(d2, snapshot_id="g2", partitions=1))
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("a", T.StringType()),
                        T.StructField("b", T.LongType())])
    blocks = io.read_blocks(merge_schema=True)
    rows = decode_blocks(blocks, schema=sch, compat=True).orderBy("k").collect()
    assert len(rows) == 20
    assert all(r["b"] is None for r in rows[:10])
    assert [r["b"] for r in rows[10:]] == list(range(10))
    # filters on the evolved column keep cross-generation semantics:
    # old rows are null-filled -> equality never matches them, is_null
    # matches exactly them (old blocks carry no 'b' sketches; pruning
    # must degrade to keep, not drop)
    eq = decode_blocks(blocks, schema=sch, compat=True,
                       filters=[("b", "=", 3)]).collect()
    assert [(r["k"], r["b"]) for r in eq] == [(13, 3)]
    nulls = decode_blocks(blocks, schema=sch, compat=True,
                          filters=[("b", "is_null")]).collect()
    assert sorted(r["k"] for r in nulls) == list(range(10))


def test_union_schema_numeric_widening(spark, tmp_path):
    """Type evolution: a column stored int32 in one generation and int64
    in another resolves to the widest same-family type (the widening
    Iceberg permits); decode casts older blocks up AFTER checksum
    verification on the stored type. Cross-family conflicts raise."""
    from sparkolumnar.engine.decode import union_schema_of_blocks
    from sparkolumnar.engine.tableio import TableIO

    io = TableIO(spark, str(tmp_path / "w"))
    s1 = T.StructType([T.StructField("k", T.IntegerType()),
                       T.StructField("v", T.FloatType())])
    s2 = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("v", T.DoubleType()),
                       T.StructField("b", T.LongType())])
    d1 = spark.createDataFrame([(i, 1.5) for i in range(10)], s1)
    d2 = spark.createDataFrame([(i, 2.5, i - 10)
                                for i in range(10, 20)], s2)
    io.write_blocks(encode_table(d1, snapshot_id="g1", partitions=1))
    io.write_blocks(encode_table(d2, snapshot_id="g2", partitions=1))
    blocks = io.read_blocks(merge_schema=True)
    sch = union_schema_of_blocks(blocks)
    assert dict((f.name, f.dataType.simpleString()) for f in sch.fields) \
        == {"k": "bigint", "v": "double", "b": "bigint"}
    rows = (decode_blocks(blocks, schema=sch, compat=True, verify=True)
            .orderBy("k").collect())
    assert [r["k"] for r in rows] == list(range(20))
    assert [r["v"] for r in rows] == [1.5] * 10 + [2.5] * 10
    # int vs float never mixes
    s3 = T.StructType([T.StructField("k", T.DoubleType()),
                       T.StructField("v", T.FloatType())])
    io.write_blocks(encode_table(
        spark.createDataFrame([(99.0, 9.5)], s3),
        snapshot_id="g3", partitions=1))
    with pytest.raises(ValueError, match="numeric widening"):
        union_schema_of_blocks(io.read_blocks(merge_schema=True))


def test_codec_override_forced(spark, small_df):
    from sparkolumnar.engine.lineage import lineage_of

    blocks = encode_table(small_df, snapshot_id="c3",
                          overrides={"v": "for_bitpack", "s": "split"})
    lin = {r["column"]: r["codec"]
           for r in lineage_of(blocks).select("column", "codec").collect()}
    assert lin["v"] == "for_bitpack"
    assert lin["s"] == "split"
    out = decode_blocks(blocks).orderBy("k").collect()
    assert [r["v"] for r in out] == [i % 7 for i in range(200)]


def test_codec_override_invalid_falls_back_to_plain(spark, small_df):
    from sparkolumnar.engine.lineage import lineage_of

    # bool_rle cannot encode strings -> plain fallback, data still correct
    blocks = encode_table(small_df, snapshot_id="c4",
                          overrides={"s": "bool_rle"})
    lin = {r["column"]: r["codec"]
           for r in lineage_of(blocks).select("column", "codec").collect()}
    assert lin["s"] == "plain"
    out = decode_blocks(blocks).orderBy("k").collect()
    assert out[7]["s"] == "s2"


def test_decimal_columns_roundtrip(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(i, Decimal(i * 7) / Decimal(100)) for i in range(200)],
        "k long, price decimal(18,2)")
    blocks = encode_table(df, snapshot_id="dec1")
    out = decode_blocks(blocks, verify=True).orderBy("k").collect()
    for i, r in enumerate(out):
        assert r["price"] == Decimal(i * 7) / Decimal(100)
