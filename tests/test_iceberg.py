"""Iceberg smoke test (skip-marked): when an iceberg-spark-runtime jar is
resolvable, IcebergTableIO (engine/tableio.py:101-131) runs the exactly-once
resume flow verbatim against a real local Iceberg catalog.

This sandbox bakes in no Iceberg jars and has no network for
spark.jars.packages, so the test skips here — but it is the executable
proof obligation for the production path: drop a jar into
$SPARK_HOME/jars (or point SPARKOLUMNAR_ICEBERG_JAR at one) and it runs.
A fresh JVM is required (catalog extensions must be set before session
start), hence the subprocess."""

import glob
import os
import subprocess
import sys
import textwrap

import pytest


def _iceberg_jar():
    env = os.environ.get("SPARKOLUMNAR_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    cands = []
    home = os.environ.get("SPARK_HOME")
    if home:
        cands += glob.glob(os.path.join(home, "jars",
                                        "iceberg-spark-runtime*.jar"))
    try:
        import pyspark
        cands += glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                        "jars", "iceberg-spark-runtime*.jar"))
    except ImportError:
        pass
    cands += glob.glob(os.path.expanduser(
        "~/.ivy2/jars/*iceberg-spark-runtime*.jar"))
    return cands[0] if cands else None


ICEBERG_JAR = _iceberg_jar()

_SCRIPT = textwrap.dedent("""
    import sys
    warehouse, jar = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[4]")
        .config("spark.jars", jar)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    from sparkolumnar.datagen import pages_df
    from sparkolumnar.engine import decode_blocks
    from sparkolumnar.engine.lineage import encode_job
    from sparkolumnar.engine.tableio import IcebergTableIO
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    pages = pages_df(spark, 3000)
    io = IcebergTableIO(spark, blocks_table="local.db.blocks",
                        checkpoint_table="local.db.checkpoint")
    r1 = encode_job(spark, pages, io, key="url", partitions=8,
                    run_id="r1", only_parts={0, 1, 2})
    assert r1.parts_encoded == 3, r1
    r2 = encode_job(spark, pages, io, key="url", partitions=8, run_id="r2")
    assert r2.parts_done_before == 3 and r2.parts_encoded == 5, r2
    blocks = io.read_blocks()
    assert blocks.count() == blocks.select("block_id").distinct().count()
    assert blocks.agg(F.sum("n_rows")).collect()[0][0] == 3000
    decoded = decode_blocks(blocks, verify=True)
    assert decoded.count() == 3000
    diff = decoded.select("url", "text").exceptAll(
        pages.select("url", "text"))
    assert diff.count() == 0
    r3 = encode_job(spark, pages, io, key="url", partitions=8, run_id="r3")
    assert r3.parts_encoded == 0, r3
    spark.stop()
    print("ICEBERG_RESUME_OK")
""")


@pytest.mark.skipif(ICEBERG_JAR is None,
                    reason="no iceberg-spark-runtime jar resolvable "
                           "(sandbox has no jars and no network)")
def test_iceberg_resume_exactly_once(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [env.get("PYTHONPATH", "")])
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(tmp_path / "warehouse"),
         ICEBERG_JAR],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "ICEBERG_RESUME_OK" in out.stdout
