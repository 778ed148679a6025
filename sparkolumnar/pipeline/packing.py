"""Context-window sequence packing — grouping documents into fixed
token budgets (the pre-tokenization batching step of an LLM training
pipeline: short documents concatenate into one context window so no
padding tokens are wasted).

The packing rule is STREAMING OFFSET packing: within each group,
documents concatenate in a deterministic order and document d goes to
bin floor(start_offset(d) / budget) — i.e. the window its first token
falls in. Compared to first-fit-decreasing this sacrifices a little
fill (a document straddling a boundary overflows its bin by up to its
own length) but in exchange is

  * one window cumulative sum — NO UDF, no driver loop, whole-stage
    codegen end-to-end;
  * deterministic and order-stable (resume/retry safe);
  * exactly recomputable in SQL (the DuckDB oracle re-derives every
    bin id), unlike any heuristic bin-packer with internal state.

Groups partition the work (e.g. pack per language, per source shard):
the window is PARTITION BY group, so the shuffle is one hash exchange
on the group columns and packing scales with the number of groups. For
a single global packing order, feed pre-bucketed group ids (e.g.
hash(doc_id) % N) — bins are then (group, bin) pairs, which is what a
sharded training-data writer wants anyway.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, tokens_col: str, budget: int,
                   group_cols: Union[str, Sequence[str], None] = None,
                   order_col: Optional[str] = None,
                   bin_col: str = "bin_id") -> DataFrame:
    """Assign each row a packing bin id (streaming offset rule above).

    tokens_col: per-document token count (precomputed — see
    textstats.token_stats). budget: tokens per context window.
    group_cols: pack independently within these columns (the shuffle
    key); None packs one global sequence (single-partition window —
    fine for oracle-scale, pass groups at scale). order_col: the
    deterministic concatenation order within a group (default: the
    token column then all remaining columns is NOT used — an explicit
    stable key like doc_id is required).

    Adds bin_col (long, 0-based per group) and keeps every input
    column. Documents longer than the budget still get exactly one
    bin (their start offset's window) — splitting/truncation is the
    tokenizer's concern, not the packer's."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if order_col is None:
        raise ValueError("pack_sequences needs an explicit order_col — "
                         "packing must be deterministic, and DataFrame "
                         "row order is not")
    groups: List[str] = ([] if group_cols is None
                         else [group_cols] if isinstance(group_cols, str)
                         else list(group_cols))
    w = (Window.partitionBy(*[F.col(g) for g in groups])
         .orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0))
    return df.withColumn(bin_col,
                         F.floor(start / F.lit(budget)).cast("long"))


def packing_stats(packed: DataFrame, tokens_col: str,
                  group_cols: Union[str, Sequence[str], None] = None,
                  bin_col: str = "bin_id") -> DataFrame:
    """Per-bin docs/tokens — the fill-rate report a packing run ends
    with (bins at ~budget tokens except each group's last)."""
    groups: List[str] = ([] if group_cols is None
                         else [group_cols] if isinstance(group_cols, str)
                         else list(group_cols))
    return (packed.groupBy(*groups, bin_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(tokens_col).alias("n_tokens"))
            .orderBy(*groups, bin_col))
