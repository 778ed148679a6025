"""Streaming decode: readStream over a growing blocks table -> original
rows, continuously. Decode is stateless and shuffle-free (one block row ->
one Arrow batch), so it composes directly with Structured Streaming: the
same mapInArrow UDF runs under the micro-batch engine unchanged.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, types as T

from ..engine.decode import make_decode_fn, schema_of_blocks


def decode_stream(spark: SparkSession, blocks_path: str,
                  schema: Optional[T.StructType] = None,
                  verify: bool = False,
                  columns: Optional[List[str]] = None) -> DataFrame:
    """Streaming DataFrame of decoded rows from a blocks directory.

    The decoded-output schema must be known up front for a stream; it is
    inferred from the existing blocks (or pass `schema`).
    """
    static = spark.read.parquet(blocks_path)
    if schema is None:
        schema = schema_of_blocks(static, columns)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 16)
              .parquet(blocks_path))
    if columns is not None:
        from ..engine.blocks import payload_field, validity_field

        base = ["block_id", "snapshot_id", "part_id", "seq", "n_rows",
                "columns"]
        have = set(stream.columns)
        keep = base + [f for c in columns
                       for f in (payload_field(c), validity_field(c))
                       if f in have]
        stream = stream.select(*keep)
    return stream.mapInArrow(make_decode_fn(verify, columns), schema)
