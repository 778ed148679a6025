"""Streaming encode: readStream -> foreachBatch(encode_job) -> blocks.

The reference is a batch library (SURVEY.md §2.2: streaming absent); our
engine's encode UDFs are batch-shaped too, so the streaming surface reuses
them unchanged under foreachBatch. Exactly-once composes from two layers:
Structured Streaming's checkpoint guarantees each micro-batch id is
processed once logically, and the engine's own per-partition checkpoint +
idempotent overwrite (engine/lineage.py) makes re-processing a replayed
micro-batch a no-op — the same protocol that makes batch resume safe.

Each micro-batch becomes its own snapshot id ("stream-<epoch id>"), so
lineage records stay queryable per micro-batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from ..engine.lineage import encode_job
from ..engine.selector import BALANCED
from ..engine.tableio import TableIO


def encode_stream(stream_df: DataFrame, io: TableIO,
                  checkpoint_location: str, key: Optional[str] = None,
                  mode: str = BALANCED, partitions: Optional[int] = None,
                  trigger_available_now: bool = True,
                  cluster_by=None, cluster_layout: str = "range",
                  snapshot_prefix: str = "stream"):
    """Start a streaming query encoding `stream_df` into io's blocks table.

    cluster_by: range-cluster each micro-batch before encoding (the same
    deterministic quantile bucketing as the batch path) so the streamed
    snapshots carry the zone-map/bloom pruning layout too — a range probe
    over the accumulated blocks table then prunes inside EVERY
    micro-batch's snapshot, not just batch-written ones.

    snapshot_prefix: snapshot ids are "<prefix>-<batch id>". A RESTART
    from the same checkpoint continues batch ids, so the default is safe
    there — but a NEW streaming query into the same table (fresh
    checkpoint: new source, or a schema-evolved generation) restarts
    batch ids at 0, and reusing the default prefix would make batch 0
    dynamically OVERWRITE the first stream's "stream-0" snapshot. Give
    each distinct query its own prefix ("gen2", ...); the generations
    then coexist as ordinary snapshots (read them together with
    read_blocks(merge_schema=True) + decode compat if schemas differ).

    Returns the StreamingQuery; callers manage await/stop.
    """
    spark = stream_df.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_job(spark, batch_df, io, key=key,
                   snapshot_id=f"{snapshot_prefix}-{batch_id}", mode=mode,
                   partitions=partitions, sort_within=key is not None,
                   run_id=f"{snapshot_prefix}-b{batch_id}", plan=None,
                   cluster_by=cluster_by, cluster_layout=cluster_layout)

    writer = (stream_df.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint_location))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
