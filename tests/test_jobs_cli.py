"""In-process CLI coverage for the spark-submit job surface (the full
subprocess path is driven by the verify recipe; these pin the argument
wiring and JSON output shapes cheaply inside the test session)."""

import json

import pytest

from sparkolumnar.datagen import pages_df
from sparkolumnar.engine import encode_table
from sparkolumnar.engine.tableio import TableIO


def test_decode_job_stats_flag(spark, tmp_path, capsys):
    from sparkolumnar.jobs import decode_job

    pages = pages_df(spark, 3000)
    io = TableIO(spark, str(tmp_path / "t"))
    io.write_blocks(encode_table(pages, snapshot_id="cli1", partitions=2))
    decode_job.main(["--blocks", str(tmp_path / "t" / "blocks"),
                     "--output", str(tmp_path / "unused"),
                     "--stats", "--columns", "lang,url"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cols = out["columns"]
    assert set(cols) == {"lang", "url"}
    assert cols["lang"]["n_rows"] == 3000 and cols["lang"]["n_nulls"] == 0
    assert cols["lang"]["min_str"] is not None
    # --stats refuses predicates/limit (it never decodes)
    with pytest.raises(ValueError, match="--stats"):
        decode_job.main(["--blocks", str(tmp_path / "t" / "blocks"),
                         "--output", "x", "--stats", "--limit", "5"])


def test_compact_job_cli(spark, tmp_path, capsys):
    from sparkolumnar.jobs import compact_job

    pages = pages_df(spark, 3000)
    io = TableIO(spark, str(tmp_path / "t"))
    io.write_blocks(encode_table(pages, key="url", sort_within=True,
                                 snapshot_id="frag", partitions=6))
    compact_job.main(["--blocks", str(tmp_path / "t" / "blocks"),
                      "--snapshot", "frag", "--partitions", "1",
                      "--key", "url", "--delete-old"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["old_blocks"] == 6 and out["new_blocks"] == 1
    assert out["n_rows"] == 3000 and out["deleted_old"]
    from sparkolumnar.engine import decode_blocks

    dec = decode_blocks(io.read_blocks())
    assert dec.count() == 3000
    assert dec.select("url", "text").exceptAll(
        pages.select("url", "text")).count() == 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_job.main(["--blocks", str(tmp_path / "t" / "blocks"),
                          "--snapshot", "x", "--key", "url",
                          "--cluster-by", "lang"])
