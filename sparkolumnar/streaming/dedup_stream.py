"""Stateful streaming dedup: drop documents whose fingerprint was already
seen in ANY earlier micro-batch (custom stateful operator via
applyInPandasWithState).

Shape: fingerprint (xxhash64 of normalized text, JVM-side) -> bucket by
fp64 % n_buckets -> per-bucket keyed state holding the seen-fingerprint
set. State is partitioned across n_buckets keys, so it shards over
executors; at 10^12-doc scale n_buckets rises with the cluster and each
bucket's state stays bounded by its fingerprint share. Late/duplicate
arrivals are dropped exactly once per fingerprint for the lifetime of the
state store (checkpointed by Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(stream_df: DataFrame, text_col: str,
                 n_buckets: int = 64) -> DataFrame:
    """Returns the deduplicated stream (first occurrence of each normalized
    text wins, across micro-batches)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    df = (stream_df
          .withColumn("fp64", F.xxhash64(norm))
          .withColumn("bucket", F.pmod(F.col("fp64"), F.lit(n_buckets)).cast("long")))

    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in stream_df.schema.fields)
    out_schema = f"{out_fields}, fp64 long"
    state_schema = "seen array<long>"
    passthrough = [f.name for f in stream_df.schema.fields]

    def fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh_mask = []
            for fp in pdf["fp64"]:
                fp = int(fp)
                if fp in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(fp)
                    fresh_mask.append(True)
            out = pdf.loc[fresh_mask, passthrough + ["fp64"]]
            if len(out):
                yield out
        state.update((list(seen),))

    return (df.groupBy("bucket")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
