"""spark-submit entry point: merge-on-read predicate UPDATE.

Usage:
  spark-submit --py-files sparkolumnar.zip \
      sparkolumnar/jobs/update_job.py \
      --blocks /path/to/engine_dir/blocks \
      --eq lang=en --set "n_chars=n_chars + 1" [--set "lang='xx'"] ...

Copy-on-write of the MATCHED rows only (engine/updates.py): the updated
rows become one new deterministic snapshot, the old rows are masked by
Iceberg-v2-style position-delete bitmaps — unmatched blocks are never
rewritten or decoded. decode_job sees the updated table immediately;
compact_job --snapshot <old>,<upd...> merges it physical. Predicate
flags AND together (delete_job's grammar); --set is repeatable, every
expression sees the ORIGINAL row values (SQL UPDATE semantics) and is
cast back to the column's stored type.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", required=True,
                    help="the table's blocks directory")
    ap.add_argument("--set", dest="sets", action="append", default=[],
                    metavar="COL=SQL_EXPR", required=False,
                    help="assignment, repeatable; the expression may "
                         "reference any column and is cast to COL's "
                         "stored type")
    ap.add_argument("--eq", default=None, metavar="COL=VALUE")
    ap.add_argument("--in", dest="in_", default=None,
                    metavar="COL=V1,V2,...")
    ap.add_argument("--not-in", dest="not_in", default=None,
                    metavar="COL=V1,V2,...")
    ap.add_argument("--null", dest="null_", default=None, metavar="COL")
    ap.add_argument("--not-null", dest="not_null", default=None,
                    metavar="COL")
    ap.add_argument("--ge", default=None, metavar="COL=VALUE")
    ap.add_argument("--le", default=None, metavar="COL=VALUE")
    ap.add_argument("--lt", default=None, metavar="COL=VALUE")
    ap.add_argument("--gt", default=None, metavar="COL=VALUE")
    ap.add_argument("--prefix", default=None, metavar="COL=VALUE")
    ap.add_argument("--partitions", type=int, default=None,
                    help="encode layout for the update snapshot (pass "
                         "for large matched sets; compaction re-lays-out "
                         "either way)")
    ap.add_argument("--merge-schema", action="store_true",
                    help="evolve-aware: needed when the predicate or an "
                         "assignment expression touches a column added "
                         "by a later schema generation")
    args = ap.parse_args(argv)

    assignments = {}
    for s in args.sets:
        col, sep, expr = s.partition("=")
        if not sep or not col.strip():
            raise ValueError("--set expects COL=SQL_EXPR")
        assignments[col.strip()] = expr
    if not assignments:
        raise ValueError("update_job needs at least one --set assignment")

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
        raise ValueError("update_job needs at least one predicate flag "
                         "— refusing to rewrite every row implicitly")

    spark = (SparkSession.builder.appName("sparkolumnar-update")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
                     "1073741824")
             .getOrCreate())

    from sparkolumnar.engine.tableio import TableIO
    from sparkolumnar.engine.updates import update_where

    io = TableIO(spark, os.path.dirname(args.blocks.rstrip("/")))
    stats = update_where(io, flist, assignments,
                         merge_schema=args.merge_schema,
                         partitions=args.partitions)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
