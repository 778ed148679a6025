"""spark-submit entry point: garbage-collect a table's crash residue.

Usage:
  spark-submit --py-files sparkolumnar.zip \
      sparkolumnar/jobs/vacuum_job.py \
      --blocks /path/to/engine_dir/blocks [--min-age-sec 3600]

Removes stale `.inprogress` write temps older than --min-age-sec (the
age guard protects a running job's in-flight files — never vacuum with
0 while writers are active) and delete-bitmap directories orphaned by a
crash between compaction's two directory drops. Metadata/listing work
only; no payload byte is read; idempotent. Driver-side, so the Spark
session is only used for configuration parity with the other jobs.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", required=True,
                    help="the table's blocks directory")
    ap.add_argument("--min-age-sec", type=float, default=3600.0,
                    help="only delete write temps older than this "
                         "(default 1h; a RUNNING job's in-flight temps "
                         "must survive)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("sparkolumnar-vacuum")
             .getOrCreate())

    from sparkolumnar.engine.maintenance import vacuum_table
    from sparkolumnar.engine.tableio import TableIO

    io = TableIO(spark, os.path.dirname(args.blocks.rstrip("/")))
    print(json.dumps(vacuum_table(io, min_age_sec=args.min_age_sec)))


if __name__ == "__main__":
    main()
