"""Skew defusal (the north rule's Zipf host-domain requirement) and
engine edge cases (empty tables, single rows, many batches per task)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkolumnar.datagen import pages_df
from sparkolumnar.engine import decode_blocks, encode_table


def test_salted_hash_defuses_zipf_skew(spark, tmp_path):
    """The pages fixture draws hosts from Zipf(1.3) (host0 alone is ~20% of
    rows). Partitioning by host would straggle; partitioning by salted
    url-hash must stay near-uniform."""
    pages = pages_df(spark, 20000, cache_dir=str(tmp_path))
    # demonstrate the skew exists in the key distribution itself
    top_host = (pages.withColumn("host", F.regexp_extract("url", r"//([^/]+)/", 1))
                .groupBy("host").count().orderBy(F.desc("count")).first())
    assert top_host["count"] > 2000  # >10% in one host: real skew
    blocks = encode_table(pages, key="url", partitions=16, snapshot_id="sk")
    sizes = [r["n"] for r in
             blocks.groupBy("part_id").agg(F.sum("n_rows").alias("n")).collect()]
    assert len(sizes) == 16
    mean = sum(sizes) / len(sizes)
    assert max(sizes) < 1.3 * mean, sizes  # no straggler partition


def test_empty_table(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                             "b": pd.Series([], dtype="object")}),
                               "a long, b string")
    blocks = encode_table(df, snapshot_id="e0")
    assert blocks.count() == 0
    # decode of an empty blocks table needs an explicit schema
    out = decode_blocks(blocks, schema=df.schema)
    assert out.count() == 0


def test_single_row(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], "a long, b string, c double")
    out = decode_blocks(encode_table(df, snapshot_id="e1"), verify=True)
    assert out.collect() == df.collect()


def test_many_batches_per_partition(spark, tmp_path):
    """Arrow batch cap (4096 in tests) forces multiple blocks per task;
    seq numbering and reassembly must hold."""
    pages = pages_df(spark, 20000, cache_dir=str(tmp_path))
    blocks = encode_table(pages, key="url", partitions=2, snapshot_id="mb")
    per_part = blocks.groupBy("part_id").count().collect()
    assert all(r["count"] >= 2 for r in per_part)
    seqs = blocks.select("part_id", "seq").collect()
    by_part = {}
    for r in seqs:
        by_part.setdefault(r["part_id"], []).append(r["seq"])
    for part, ss in by_part.items():
        assert sorted(ss) == list(range(len(ss)))  # dense seq per partition
    assert decode_blocks(blocks).count() == 20000


def test_all_null_column(spark):
    pdf = pd.DataFrame({"k": range(50), "v": [None] * 50})
    df = spark.createDataFrame(pdf, "k long, v string")
    out = decode_blocks(encode_table(df, snapshot_id="e2"), verify=True)
    rows = out.orderBy("k").collect()
    assert all(r["v"] is None for r in rows) and len(rows) == 50


def test_special_column_names_roundtrip(spark, tmp_path):
    """Spaces/dashes/unicode in column names must survive the wide
    p_<col> blocks layout through parquet."""
    import pandas as pd

    pdf = pd.DataFrame({"my col": [1, 2, 3], "col-1": ["a", "b", "c"],
                        "naïve": [1.5, 2.5, 3.5]})
    df = spark.createDataFrame(pdf)
    blocks = encode_table(df, snapshot_id="odd")
    p = str(tmp_path / "b")
    blocks.write.mode("overwrite").parquet(p)
    out = decode_blocks(spark.read.parquet(p), verify=True).collect()
    assert sorted(r["my col"] for r in out) == [1, 2, 3]
    assert {r["col-1"] for r in out} == {"a", "b", "c"}
