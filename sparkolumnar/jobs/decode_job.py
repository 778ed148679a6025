"""spark-submit entry point: decode a blocks table back to parquet.

Usage:
  spark-submit --py-files sparkolumnar.zip -m sparkolumnar.jobs.decode_job \
      --blocks /path/to/engine_dir/blocks --output /path/to/decoded \
      [--columns url,text] [--verify] [--limit N]

--limit N decodes only the first N rows (blocks ordered by part_id, seq):
the payload scan is filtered to the needed blocks' coordinate range and
partially-needed blocks prefix-decode (the reference's take_n_finalize) —
a preview read never materializes the whole table's payloads. Combined
with --eq, the limit counts MATCHING rows (filter first, then limit).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--columns", default=None)
    ap.add_argument("--verify", action="store_true",
                    help="recompute canonical checksums while decoding")
    ap.add_argument("--limit", type=int, default=None,
                    help="decode only N rows (partial decode); with --eq, "
                         "N MATCHING rows (the limit applies after the "
                         "exact filter)")
    ap.add_argument("--offset", type=int, default=0,
                    help="with --limit: skip this many rows first")
    ap.add_argument("--eq", default=None, metavar="COL=VALUE",
                    help="equality predicate: zone/bloom sketches skip "
                         "whole blocks, then the exact filter applies")
    ap.add_argument("--in", dest="in_", default=None,
                    metavar="COL=V1,V2,...",
                    help="IN-list predicate: each value is bloom/zone-"
                         "probed and surviving blocks unioned before any "
                         "payload decode; ANDs with --eq")
    ap.add_argument("--not-in", dest="not_in", default=None,
                    metavar="COL=V1,V2,...",
                    help="NOT IN predicate: provably-constant blocks "
                         "equal to a listed value (and all-null blocks) "
                         "are pruned before any payload decode; ANDs "
                         "with the other predicates")
    ap.add_argument("--null", dest="null_", default=None, metavar="COL",
                    help="IS NULL predicate: blocks with zero nulls in "
                         "COL prune on n_nulls metadata alone")
    ap.add_argument("--not-null", dest="not_null", default=None,
                    metavar="COL",
                    help="IS NOT NULL predicate: all-null blocks prune "
                         "on n_nulls metadata alone")
    ap.add_argument("--ge", default=None, metavar="COL=VALUE",
                    help="range predicate col >= value (ISO timestamps "
                         "accepted); prunes via zone maps incl. string-"
                         "prefix bounds; ANDs with the other predicates")
    ap.add_argument("--le", default=None, metavar="COL=VALUE",
                    help="range predicate col <= value; see --ge")
    ap.add_argument("--prefix", default=None, metavar="COL=VALUE",
                    help="string prefix predicate (url scans: "
                         "startswith); prunes blocks via the truncated-"
                         "prefix zone bounds as the range "
                         "[prefix, incremented-prefix)")
    ap.add_argument("--stats", action="store_true",
                    help="print per-column metadata-only statistics "
                         "(rows, nulls, min/max from zone bounds) as one "
                         "JSON line and exit WITHOUT decoding — reads "
                         "only block metadata, zero payload bytes; "
                         "--output is ignored, --columns restricts the "
                         "reported columns. With merge-on-read deletes "
                         "present, an extra n_rows_live reports stored "
                         "minus deleted per column (bitmap popcounts "
                         "are delete-file metadata — still zero payload "
                         "bytes); n_nulls and min/max stay STORED-row "
                         "facts (bounds remain sound for live rows)")
    ap.add_argument("--snapshot", default=None, metavar="ID1,ID2,...",
                    help="snapshot-scoped read: decode ONLY these "
                         "snapshots' blocks (snapshot_id is the first "
                         "hive partition key, so unlisted snapshots' "
                         "directories are pruned at the scan — per-"
                         "generation reads, micro-batch inspection, "
                         "pinned reads while writers append). Composes "
                         "with every other flag incl. --direct and "
                         "--stats")
    ap.add_argument("--merge-schema", action="store_true",
                    help="merge parquet footers across block files: "
                         "needed when the table's snapshots span schema "
                         "generations (streaming schema evolution), so "
                         "the newer generation's payload columns survive "
                         "the scan; off by default because footer-merge "
                         "is a per-file metadata job")
    ap.add_argument("--ignore-deletes", action="store_true",
                    help="skip the table's merge-on-read position "
                         "deletes (<base>/deletes, written by "
                         "delete_job): by default deleted rows are "
                         "masked out of every decode; this flag reads "
                         "the stored rows as written")
    ap.add_argument("--direct", action="store_true",
                    help="write-in-UDF direct decode: tasks read blocks "
                         "files with pyarrow and write the decoded "
                         "parquet themselves — decoded bytes never cross "
                         "JVM<->Python IPC. Combines with --eq (in-task "
                         "zone/bloom pruning + row-group skip); "
                         "incompatible with --limit/--offset")
    args = ap.parse_args(argv)

    spark = (SparkSession.builder.appName("sparkolumnar-decode")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
             .getOrCreate())

    from sparkolumnar.engine.decode import decode_blocks

    cols = args.columns.split(",") if args.columns else None
    flist = []
    if args.eq:
        col, sep, value = args.eq.partition("=")
        if not sep:
            raise ValueError("--eq expects COL=VALUE")
        flist.append((col, "=", value))
    if args.in_:
        col, sep, values = args.in_.partition("=")
        if not sep:
            raise ValueError("--in expects COL=V1,V2,...")
        flist.append((col, "in", values.split(",")))
    if args.not_in:
        col, sep, values = args.not_in.partition("=")
        if not sep:
            raise ValueError("--not-in expects COL=V1,V2,...")
        flist.append((col, "not in", values.split(",")))
    if args.null_:
        flist.append((args.null_, "is_null"))
    if args.not_null:
        flist.append((args.not_null, "is_not_null"))
    for flag, op, name in ((args.ge, ">=", "ge"), (args.le, "<=", "le"),
                           (args.prefix, "starts_with", "prefix")):
        if flag:
            col, sep, value = flag.partition("=")
            if not sep:
                raise ValueError(f"--{name} expects COL=VALUE")
            flist.append((col, op, value))
    filters = flist or None
    # merge-on-read deletes apply by DEFAULT — a reader must not see
    # deleted rows unless it explicitly opts into the stored bytes
    import os as _os

    from sparkolumnar.engine.tableio import TableIO as _TIO

    _io = _TIO(spark, _os.path.dirname(args.blocks.rstrip("/")))
    deletes = None if args.ignore_deletes else _io.read_deletes()
    snaps = args.snapshot.split(",") if args.snapshot else None
    if snaps is not None:
        # validate up front (one metadata-only distinct) so a typo'd id
        # fails loudly instead of decoding an empty table
        have = {r["snapshot_id"] for r in
                spark.read.parquet(args.blocks)
                .select("snapshot_id").distinct().collect()}
        missing = [s for s in snaps if s not in have]
        if missing:
            raise ValueError(f"snapshots {missing} not in the table "
                             f"(available: {sorted(have)})")

    def _scope(blocks_df):
        if snaps is None:
            return blocks_df
        # snapshot_id is the leading hive partition key: Catalyst turns
        # this into PartitionFilters — unlisted directories never scan
        from pyspark.sql import functions as F

        return blocks_df.where(F.col("snapshot_id").isin(snaps))

    if args.stats:
        if filters or args.limit is not None or args.direct:
            raise ValueError("--stats does not combine with predicates, "
                             "--limit or --direct (it never decodes)")
        from sparkolumnar.engine.analyze import metadata_stats

        blocks = _scope(spark.read.parquet(args.blocks))
        rows = metadata_stats(blocks, columns=cols,
                              deletes=deletes).collect()
        print(json.dumps({"columns": {
            r["column"]: dict(
                {"n_blocks": r["n_blocks"], "n_rows": r["n_rows"],
                 "n_nulls": r["n_nulls"], "min_i64": r["min_i64"],
                 "max_i64": r["max_i64"], "min_f64": r["min_f64"],
                 "max_f64": r["max_f64"], "min_str": r["min_str"],
                 "max_str": r["max_str"]},
                **({"n_rows_live": r["n_rows_live"]}
                   if deletes is not None else {}))
            for r in rows}}))
        return
    if args.direct:
        if args.limit is not None:
            raise ValueError("--direct does not combine with "
                             "--limit/--offset (use the IPC path)")
        import os

        from sparkolumnar.engine.direct import decode_files_direct
        from sparkolumnar.engine.tableio import TableIO

        io = TableIO(spark, os.path.dirname(args.blocks.rstrip("/")))
        schema = None
        if args.merge_schema:
            from sparkolumnar.engine.decode import union_schema_of_blocks

            # schema-evolved table: every task decodes compat against the
            # union schema so the output directory is ONE parquet schema
            schema = union_schema_of_blocks(
                spark.read.option("mergeSchema", "true")
                .parquet(args.blocks))
        res = decode_files_direct(spark, io, args.output, columns=cols,
                                  verify=args.verify, filters=filters,
                                  schema=schema,
                                  deletes_path=(io.deletes_path
                                                if deletes is not None
                                                else None),
                                  snapshots=snaps)
        print(json.dumps({"rows": res["n_rows"],
                          "blocks_read": res["n_blocks_read"],
                          "blocks_total": res["n_blocks_total"]}))
        return
    if args.merge_schema:
        from sparkolumnar.engine.decode import union_schema_of_blocks

        # schema-evolved table: merge footers so every generation's payload
        # columns survive the scan, infer the UNION schema from all blocks'
        # metadata, and decode compat (older blocks null-fill added columns)
        blocks = _scope(spark.read.option("mergeSchema", "true")
                        .parquet(args.blocks))
        schema = union_schema_of_blocks(blocks)
        if cols is not None:
            have = {f.name for f in schema.fields}
            missing = [c for c in cols if c not in have]
            if missing:
                raise ValueError(
                    f"requested columns {missing} not in the blocks table "
                    f"(available: {sorted(have)})")
            schema = type(schema)([f for f in schema.fields
                                   if f.name in cols])
        out = decode_blocks(blocks, schema=schema, compat=True,
                            verify=args.verify, limit=args.limit,
                            offset=args.offset, filters=filters,
                            deletes=deletes)
    else:
        blocks = _scope(spark.read.parquet(args.blocks))
        out = decode_blocks(blocks, verify=args.verify, columns=cols,
                            limit=args.limit, offset=args.offset,
                            filters=filters, deletes=deletes)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": spark.read.parquet(args.output).count()}))


if __name__ == "__main__":
    main()
