"""spark-submit entry point: MERGE INTO (whole-row upsert).

Usage:
  spark-submit --py-files sparkolumnar.zip \
      sparkolumnar/jobs/merge_job.py \
      --blocks /path/to/engine_dir/blocks \
      --source /path/to/source_parquet --on doc_id [--snapshot id]

Every source row is inserted as one new snapshot; stored rows whose key
matches a source key are masked by position-delete bitmaps
(engine/updates.py merge_upsert — matched rows replaced, unmatched
inserted). The delete scan decodes ONLY the key column; under
--broadcast-threshold keys it runs in-task with zero shuffle, above it
a single key-column shuffle join. The snapshot id defaults to a hash of
the source file listing, so a crashed run re-submitted converges.
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
    ap.add_argument("--source", required=True,
                    help="parquet path of the source rows (must carry "
                         "the table's column set)")
    ap.add_argument("--on", required=True, metavar="COL",
                    help="merge key column (source keys must be unique)")
    ap.add_argument("--snapshot", default=None,
                    help="explicit insert-snapshot id (default: derived "
                         "from the source file listing)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--key", default=None,
                    help="encode sort/shuffle key for the insert "
                         "snapshot (see encode_job --key)")
    ap.add_argument("--broadcast-threshold", type=int, default=500_000,
                    help="max distinct source keys for the zero-shuffle "
                         "broadcast delete scan; larger sources use a "
                         "key-column shuffle join")
    args = ap.parse_args(argv)

    spark = (SparkSession.builder.appName("sparkolumnar-merge")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
                     "1073741824")
             .getOrCreate())

    from sparkolumnar.engine.tableio import TableIO
    from sparkolumnar.engine.updates import merge_upsert

    io = TableIO(spark, os.path.dirname(args.blocks.rstrip("/")))
    stats = merge_upsert(io, spark.read.parquet(args.source), on=args.on,
                         snapshot_id=args.snapshot,
                         partitions=args.partitions, key=args.key,
                         broadcast_threshold=args.broadcast_threshold)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
