"""spark-submit entry point: merge-on-read predicate delete.

Usage:
  spark-submit --py-files sparkolumnar.zip \
      sparkolumnar/jobs/delete_job.py \
      --blocks /path/to/engine_dir/blocks --eq lang=en [--ge ...] ...

Writes Iceberg-v2-style position-delete bitmaps (engine/deletes.py) to
<engine_dir>/deletes — no data block is rewritten. Blocks that cannot
match the predicate are pruned on zone/bloom/prefix metadata without a
payload byte read; survivors decode ONLY the predicate's columns.
decode_job applies the bitmaps by default from then on; compact_job
makes them physical and purges them. All predicate flags AND together;
run the job once per OR-branch for a disjunction (bitmaps OR at read
time, so the ops compose exactly).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", required=True,
                    help="the table's blocks directory (deletes are "
                         "written to the sibling <base>/deletes)")
    ap.add_argument("--eq", default=None, metavar="COL=VALUE")
    ap.add_argument("--in", dest="in_", default=None,
                    metavar="COL=V1,V2,...")
    ap.add_argument("--not-in", dest="not_in", default=None,
                    metavar="COL=V1,V2,...")
    ap.add_argument("--null", dest="null_", default=None, metavar="COL",
                    help="delete rows where COL IS NULL")
    ap.add_argument("--not-null", dest="not_null", default=None,
                    metavar="COL")
    ap.add_argument("--ge", default=None, metavar="COL=VALUE")
    ap.add_argument("--le", default=None, metavar="COL=VALUE")
    ap.add_argument("--lt", default=None, metavar="COL=VALUE")
    ap.add_argument("--gt", default=None, metavar="COL=VALUE")
    ap.add_argument("--prefix", default=None, metavar="COL=VALUE",
                    help="delete rows where COL starts with VALUE")
    ap.add_argument("--merge-schema", action="store_true",
                    help="evolve-aware scan: needed when the predicate "
                         "column was added by a later schema generation")
    args = ap.parse_args(argv)

    flist = []
    if args.eq:
        col, sep, value = args.eq.partition("=")
        if not sep:
            raise ValueError("--eq expects COL=VALUE")
        flist.append((col, "=", value))
    for flag, name in ((args.in_, "in"), (args.not_in, "not in")):
        if flag:
            col, sep, values = flag.partition("=")
            if not sep:
                raise ValueError(f"--{name.replace(' ', '-')} expects "
                                 "COL=V1,V2,...")
            flist.append((col, name, values.split(",")))
    if args.null_:
        flist.append((args.null_, "is_null"))
    if args.not_null:
        flist.append((args.not_null, "is_not_null"))
    for flag, op, name in ((args.ge, ">=", "ge"), (args.le, "<=", "le"),
                           (args.lt, "<", "lt"), (args.gt, ">", "gt"),
                           (args.prefix, "starts_with", "prefix")):
        if flag:
            col, sep, value = flag.partition("=")
            if not sep:
                raise ValueError(f"--{name} expects COL=VALUE")
            flist.append((col, op, value))
    if not flist:
        raise ValueError("delete_job needs at least one predicate flag "
                         "— refusing to delete every row implicitly")

    spark = (SparkSession.builder.appName("sparkolumnar-delete")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
                     "1073741824")
             .getOrCreate())

    from sparkolumnar.engine.deletes import delete_where
    from sparkolumnar.engine.tableio import TableIO

    io = TableIO(spark, os.path.dirname(args.blocks.rstrip("/")))
    stats = delete_where(io, flist, merge_schema=args.merge_schema)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
