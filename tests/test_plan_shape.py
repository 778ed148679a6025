"""Physical-plan shape assertions: the engine must keep Catalyst's
pushdown/pruning working (scans must not read payload bytes for
metadata-only queries, and encode must cost exactly one shuffle)."""

import pytest
from pyspark.sql import functions as F

from sparkolumnar.datagen import pages_df
from sparkolumnar.engine import encode_table
from sparkolumnar.engine.lineage import lineage_of
from sparkolumnar.engine.tableio import TableIO


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lineage_scan_prunes_payloads(spark, tmp_path):
    pages = pages_df(spark, 2000)
    io = TableIO(spark, str(tmp_path / "t"))
    io.write_blocks(encode_table(pages, snapshot_id="p1", partitions=2))
    blocks = io.read_blocks()
    lin = lineage_of(blocks).groupBy("column").agg(F.sum("bytes_out"))
    plan = _plan_of(lin)
    # the parquet scan for lineage must NOT read any payload/validity bytes
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l or "ReadSchema" in l]
    scan = " ".join(scan_lines)
    assert "p_text" not in scan and "p_html" not in scan, scan
    assert "v_text" not in scan, scan
    assert "columns" in scan  # metadata struct leaves are read


def test_encode_plan_single_exchange(spark):
    pages = pages_df(spark, 2000)
    blocks = encode_table(pages, key="url", snapshot_id="p2", sort_within=True)
    plan = _plan_of(blocks)
    assert plan.count("Exchange") == 1  # exactly one shuffle
    assert "xxhash64" in plan  # salted key-hash partitioning
    # within-partition sort, not a global Sort (no range exchange)
    assert "rangepartitioning" not in plan.lower()


def test_decode_plan_no_exchange(spark, tmp_path):
    pages = pages_df(spark, 2000)
    io = TableIO(spark, str(tmp_path / "t2"))
    io.write_blocks(encode_table(pages, snapshot_id="p3", partitions=2))
    from sparkolumnar.engine import decode_blocks
    out = decode_blocks(io.read_blocks())
    plan = _plan_of(out)
    assert "Exchange" not in plan  # decode is shuffle-free


def test_projection_decode_prunes_payloads_at_scan(spark, tmp_path):
    """Decoding only url+lang must not read text/html payload bytes from
    parquet (the wide per-column payload layout makes this a plain
    Catalyst projection)."""
    pages = pages_df(spark, 2000)
    io = TableIO(spark, str(tmp_path / "t3"))
    io.write_blocks(encode_table(pages, snapshot_id="p4", partitions=2))
    from sparkolumnar.engine import decode_blocks
    out = decode_blocks(io.read_blocks(), columns=["url", "lang"])
    plan = _plan_of(out)
    scan_lines = [l for l in plan.splitlines()
                  if "FileScan" in l or "ReadSchema" in l]
    scan = " ".join(scan_lines)
    assert "p_url" in scan and "p_lang" in scan, scan
    assert "p_text" not in scan and "p_html" not in scan, scan
    assert out.count() == 2000


def test_plan_sample_spans_partitions(spark):
    """build_plan's sample must draw from more than one partition (a
    limit()-style head pull would mis-plan sorted/clustered inputs)."""
    from sparkolumnar.engine.plan import sample_table

    pages = pages_df(spark, 4000).repartition(8)
    tagged = pages.withColumn("pid", F.spark_partition_id())
    sample = sample_table(tagged, sample_rows=2048)
    pids = set(sample.column("pid").to_pylist())
    assert len(pids) > 1, pids


def test_plan_picks_fsst_on_clustered_input(spark):
    """A value-clustered (sorted) input must still yield the same codec
    decisions as the natural order — the cross-partition sample defeats
    first-partition bias."""
    from sparkolumnar.engine.plan import build_plan

    pages = pages_df(spark, 4000)
    natural = build_plan(pages)
    clustered = build_plan(pages.repartition(8).sortWithinPartitions("lang"))
    for col in ("text", "html", "url"):
        assert clustered.columns[col].codec == natural.columns[col].codec


def test_zone_map_block_pruning(spark, tmp_path):
    """Zone maps: a ts-range decode must skip blocks whose [min, max]
    cannot overlap, read no payload bytes for them, and still return
    exactly the rows an unpruned decode + filter returns."""
    from sparkolumnar.engine import decode_blocks, encode_table, zone_filter
    from sparkolumnar.engine.tableio import TableIO

    # warc_ts increases with row id -> sorting gives disjoint block ranges
    pages = (pages_df(spark, 20_000).coalesce(1)
             .sortWithinPartitions("warc_ts"))
    io = TableIO(spark, str(tmp_path / "zt"))
    io.write_blocks(encode_table(pages, snapshot_id="z1", partitions=1))
    blocks = io.read_blocks()
    n_blocks = blocks.count()
    assert n_blocks > 1
    import datetime as dt

    b = pages.selectExpr("min(warc_ts) lo", "max(warc_ts) hi").collect()[0]

    def us(d):  # naive timestamp -> canonical epoch micros (NTZ-as-UTC)
        epoch = dt.datetime(1970, 1, 1)
        return int((d - epoch).total_seconds() * 1_000_000)

    lo_us = us(b["lo"])
    hi_us = lo_us + (us(b["hi"]) - lo_us) // 10  # first ~10% of time
    hi_dt = b["lo"] + dt.timedelta(microseconds=hi_us - lo_us)
    pruned = zone_filter(blocks, "warc_ts", lo_us, hi_us)
    assert 0 < pruned.count() < n_blocks  # real pruning happened
    got = (decode_blocks(pruned)
           .filter(F.col("warc_ts").between(b["lo"], hi_dt)))
    want = (decode_blocks(blocks)
            .filter(F.col("warc_ts").between(b["lo"], hi_dt)))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # the pruning predicate reads metadata leaves only (no payload bytes)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "columns" in plan


def test_bloom_zone_eq_pruning(spark, tmp_path):
    """Bloom sketch equality pruning: lang-clustered blocks, an equality
    probe keeps only blocks that may contain the value, results match the
    unpruned decode + filter exactly."""
    from sparkolumnar.engine import (decode_blocks, encode_table,
                                     zone_filter_eq)
    from sparkolumnar.engine.tableio import TableIO

    pages = (pages_df(spark, 20_000).coalesce(1)
             .sortWithinPartitions("lang"))  # clusters langs into blocks
    io = TableIO(spark, str(tmp_path / "bt"))
    io.write_blocks(encode_table(pages, snapshot_id="b1", partitions=1))
    blocks = io.read_blocks()
    n_blocks = blocks.count()
    assert n_blocks > 1
    # a rare lang lives in few blocks; 'en' (l00) is the hot one
    rare = (pages.groupBy("lang").count().orderBy("count")
            .limit(1).collect()[0]["lang"])
    pruned = zone_filter_eq(blocks, "lang", rare)
    assert 0 < pruned.count() < n_blocks
    got = decode_blocks(pruned).filter(F.col("lang") == rare)
    want = decode_blocks(blocks).filter(F.col("lang") == rare)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    # a value that exists nowhere prunes every bloom-carrying block
    none = zone_filter_eq(blocks, "lang", "definitely-not-a-lang")
    assert none.count() < n_blocks


def test_float_zone_map_pruning(spark, tmp_path):
    from sparkolumnar.engine import decode_blocks, encode_table, zone_filter
    from sparkolumnar.engine.tableio import TableIO

    df = (spark.range(30_000)
          .withColumn("v", (F.col("id") / 100.0))
          .coalesce(1).sortWithinPartitions("v"))
    io = TableIO(spark, str(tmp_path / "fz"))
    io.write_blocks(encode_table(df, snapshot_id="f1", partitions=1))
    blocks = io.read_blocks()
    n_blocks = blocks.count()
    assert n_blocks > 1
    pruned = zone_filter(blocks, "v", 10.0, 20.0)
    assert 0 < pruned.count() < n_blocks
    got = decode_blocks(pruned).filter(F.col("v").between(10.0, 20.0))
    want = df.filter(F.col("v").between(10.0, 20.0))
    assert got.count() == want.count() > 0


def test_zone_filter_unknown_column_keeps_all(spark, tmp_path):
    """A typo'd column name must not silently prune every block."""
    from sparkolumnar.engine import encode_table, zone_filter, zone_filter_eq
    from sparkolumnar.engine.tableio import TableIO

    pages = pages_df(spark, 2000)
    io = TableIO(spark, str(tmp_path / "uz"))
    io.write_blocks(encode_table(pages, snapshot_id="u1", partitions=2))
    blocks = io.read_blocks()
    n = blocks.count()
    assert zone_filter(blocks, "no_such_column", 0, 10).count() == n
    assert zone_filter_eq(blocks, "no_such_column", "x").count() == n


def test_bucket_sql_matches_py4j_tree(spark):
    """r4-verdict item #5: the string-rendered CASE build of the
    cluster_by bucket expression assigns EVERY row the same bucket as
    the py4j when()-tree, across int/string/float/timestamp/date and
    composite keys (timestamps canonicalize to unix_micros — a monotone
    bijection), with nulls taking bucket 0 in both shapes — and the
    16k-boundary build is sub-second (vs tens of seconds of py4j)."""
    import datetime as dt
    import random
    import time

    from pyspark.sql import functions as F

    from sparkolumnar.engine.encode import (_cluster_bucket_boundaries,
                                            _cluster_bucket_expr_py4j,
                                            _cluster_bucket_sql)

    rng = random.Random(7)
    base = dt.datetime(2025, 1, 1)
    rows = [(i, rng.randrange(-500, 500), f"k{rng.randrange(60):03d}'x\\y",
             base + dt.timedelta(minutes=rng.randrange(10000)),
             rng.random() * 100,
             dt.date(2025, 1, 1) + dt.timedelta(days=rng.randrange(300)))
            for i in range(3000)]
    df = spark.createDataFrame(
        rows, "id long, v long, s string, t timestamp, f double, d date")
    for cols in (["t"], ["s"], ["v", "s"], ["t", "id"], ["d", "f"]):
        bounds = _cluster_bucket_boundaries(df, cols, n_buckets=16)
        sql = _cluster_bucket_sql(cols, bounds)
        assert sql is not None, cols
        both = (df.withColumn("a", F.expr(sql))
                .withColumn("b", _cluster_bucket_expr_py4j(cols, bounds)))
        assert both.filter(F.col("a") != F.col("b")).count() == 0, cols
        assert both.select("a").distinct().count() == 16, cols
    # null key component: bucket 0 in both shapes
    dfn = spark.createDataFrame([(None, "x"), (5, "y")], "v int, s string")
    bounds = [(3, "a"), (7, "b")]
    sql = _cluster_bucket_sql(["v", "s"], bounds)
    got = (dfn.withColumn("a", F.expr(sql))
           .withColumn("b", _cluster_bucket_expr_py4j(["v", "s"], bounds))
           .orderBy("s").collect())
    assert [(r["a"], r["b"]) for r in got] == [(0, 0), (1, 1)]
    # plan-build cost at the 16k-bucket scale: render + parse < 2 s
    big = [(f"key{i:08d}",) for i in range(16384)]
    t0 = time.time()
    F.expr(_cluster_bucket_sql(["s"], big))
    assert time.time() - t0 < 2.0
    # unrenderable boundary types (NTZ/naive datetimes) fall back
    assert _cluster_bucket_sql(["t"], [(dt.datetime(2025, 1, 1),)]) is None


def test_metadata_stats_exact_and_payload_pruned(spark, tmp_path):
    """metadata_stats answers COUNT/MIN/MAX/null-count from block
    metadata alone: the scan reads no payload/validity bytes, counts
    and canonical int bounds are exact, short-string bounds are exact,
    and long-string bounds are sound 32-byte prefix bounds."""
    from sparkolumnar.engine.analyze import metadata_stats

    pages = pages_df(spark, 4000)
    io = TableIO(spark, str(tmp_path / "ms"))
    io.write_blocks(encode_table(pages, snapshot_id="ms1", partitions=2))
    blocks = io.read_blocks()
    st = metadata_stats(blocks, columns=["lang", "warc_ts", "url"])
    plan = _plan_of(st)
    scan = " ".join(l for l in plan.splitlines()
                    if "FileScan" in l or "ReadSchema" in l)
    assert "p_text" not in scan and "p_html" not in scan, scan
    assert "v_text" not in scan, scan
    rows = {r["column"]: r for r in st.collect()}
    n = pages.count()
    agg = pages.agg(F.min("lang").alias("lmin"), F.max("lang").alias("lmax"),
                    F.min("warc_ts").alias("tmin"),
                    F.max("warc_ts").alias("tmax"),
                    F.min("url").alias("umin"),
                    F.max("url").alias("umax")).collect()[0]
    for c in ("lang", "warc_ts", "url"):
        assert rows[c]["n_rows"] == n and rows[c]["n_nulls"] == 0
    # 2-byte lang: prefix bounds are exact
    assert rows["lang"]["min_str"] == agg["lmin"]
    assert rows["lang"]["max_str"] == agg["lmax"]
    # NTZ timestamps: canonical bounds are the wall-clock epoch micros
    import datetime as dt

    def ntz_micros(d):
        return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    assert rows["warc_ts"]["min_i64"] == ntz_micros(agg["tmin"])
    assert rows["warc_ts"]["max_i64"] == ntz_micros(agg["tmax"])
    # urls may exceed the 32-byte prefix: bounds are sound and tight
    assert rows["url"]["min_str"] <= agg["umin"]
    assert agg["umin"].startswith(rows["url"]["min_str"][:32])
    assert rows["url"]["max_str"] >= agg["umax"][:len(rows["url"]["max_str"])] \
        or rows["url"]["max_str"] >= agg["umax"]


def test_regional_revenue_join_plan_scale_safe(spark):
    """The Q5-shape six-table join: nation/region (bounded-size dims at
    ANY scale) carry forced broadcast hints; customer/supplier are
    SF-proportional, so they must NOT be forced — the planner's size
    estimates / AQE broadcast them at this sf and may legitimately
    shuffle them at 100x (a forced broadcast there is an OOM). At bench
    scale the compiled plan still broadcasts all four dims and only the
    fact-fact lineitem-orders join may shuffle."""
    import inspect

    import __spark_entry__ as entry

    df = entry.queries()["regional_revenue"](spark, "/root/testdata/sf0.01")
    plan = _plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    shuffles = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert shuffles <= 1, plan
    # the scale-safety property the small-sf plan cannot show: only the
    # two bounded dims are FORCED
    src = inspect.getsource(entry._q_regional_revenue)
    assert src.count("F.broadcast(") == 2, src


def test_dml_plans_shuffle_free(spark, tmp_path):
    """The DML scans stay single-stage: compute_deletes (predicate path)
    and compute_deletes_by_keys (broadcast key path) are prune +
    mapInArrow with ZERO Exchange; decode_blocks(deletes=) on the
    closure path adds neither an Exchange nor a Join to the payload
    scan (the bitmaps ride the task closure) — payload bytes never
    shuffle for any DML read or write."""
    import pandas as pd

    from sparkolumnar.engine import decode_blocks
    from sparkolumnar.engine.deletes import (compute_deletes,
                                             compute_deletes_by_keys)

    io = TableIO(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(pd.DataFrame({"k": range(5000),
                                             "v": range(5000)}))
    io.write_blocks(encode_table(df, snapshot_id="s", partitions=2))
    blocks = io.read_blocks()

    d = compute_deletes(blocks, [("k", "<", 100)])
    assert "Exchange" not in _plan_of(d)

    dk = compute_deletes_by_keys(blocks,
                                 df.where("k % 7 = 0").select("k"), "k")
    assert "Exchange" not in _plan_of(dk)

    out = decode_blocks(blocks, deletes=d)
    plan = _plan_of(out)
    assert "Exchange" not in plan and "Join" not in plan
