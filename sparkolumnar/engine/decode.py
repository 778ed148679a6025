"""Distributed decode: blocks DataFrame -> original-table DataFrame.

Because a block is one row carrying every column payload, decode is a
shuffle-free mapInArrow: each task reads block rows and emits the original
Arrow batches. Verification (bit-identity) recomputes the canonical
checksum of every decoded column and compares with the stored one — the
reference's round-trip property re-expressed as a distributed invariant.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, types as T
from pyspark.sql.pandas.types import from_arrow_type

from ..codecs.nputil import CodecError
from .blocks import (arrow_type_from_str, canonical_checksum, payload_field,
                     validity_field)


def decode_block_row(row: dict, verify: bool = False,
                     columns: Optional[List[str]] = None,
                     target: Optional[pa.Schema] = None,
                     budget: Optional[tuple] = None) -> pa.RecordBatch:
    """Decode one block row.

    target: optional reader schema for forward/backward compatibility,
    mirroring the reference's indexed-optional-column semantics
    (columnar_derive/src/serde/de.rs:215-243): block columns absent from
    the target are ignored (forward compat); target columns absent from the
    block are null-filled (backward compat).
    """
    from ..codecs import get_codec

    n = row["n_rows"]
    # budget: None (whole block) or (skip, take) row window within it
    if budget is None:
        skip, k = 0, n
    else:
        skip, take = budget
        skip = min(skip, n)
        k = min(take, n - skip)
    arrays = []
    fields = []
    if target is not None:
        want = [f.name for f in target]
    for meta in row["columns"]:
        if columns is not None and meta["name"] not in columns:
            continue
        if target is not None and meta["name"] not in want:
            continue  # unknown-to-reader column: ignore (forward compat)
        payload = row.get(payload_field(meta["name"]))
        validity = row.get(validity_field(meta["name"])) or b""
        if payload is None:
            raise CodecError(
                f"payload field for column {meta['name']} not in scan "
                f"(projection must include it)")
        typ = arrow_type_from_str(meta["arrow_type"])
        n_nulls = meta["n_nulls"]
        n_valid = n - n_nulls
        codec = get_codec(meta["codec"])
        whole = skip == 0 and k == n
        if n_nulls:
            from ..codecs.core import reassemble_nulls

            valid = get_codec("bool_rle").decode(validity, n, pa.bool_())
            vm_all = valid.to_numpy(zero_copy_only=False)
            vmask = vm_all[skip:skip + k]
            v_start = int(vm_all[:skip].sum())
            k_valid = int(vmask.sum())
            vals = (codec.decode(payload, n_valid, typ) if whole
                    else codec.decode_range(payload, n_valid, typ,
                                            v_start, v_start + k_valid))
            arr = reassemble_nulls(vals, vmask, k, typ)
        else:
            arr = (codec.decode(payload, n_valid, typ) if whole
                   else codec.decode_range(payload, n_valid, typ,
                                           skip, skip + k))
        if verify and whole and canonical_checksum(arr) != meta["checksum_in"]:
            # (checksums cover whole columns; partial decodes skip verify)
            raise CodecError(
                f"round-trip checksum mismatch for column {meta['name']} "
                f"in block {row['block_id']}")
        arrays.append(arr)
        fields.append(pa.field(meta["name"], typ))
    if target is not None:
        # backward compat: null-fill target columns missing from the block,
        # and emit in target order
        by_name = dict(zip((f.name for f in fields), arrays))
        arrays = [by_name[f.name].cast(f.type) if f.name in by_name
                  else pa.nulls(k, f.type) for f in target]
        fields = list(target)
    return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))


def make_decode_fn(verify: bool = False, columns: Optional[List[str]] = None,
                   target: Optional[pa.Schema] = None,
                   budgets: Optional[dict] = None):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for row in b.to_pylist():
                budget = None
                if budgets is not None:
                    budget = budgets.get(row["block_id"])
                    if budget is None:
                        continue
                out = decode_block_row(row, verify=verify, columns=columns,
                                       target=target, budget=budget)
                if out.num_rows:
                    yield out

    return fn


def schema_of_blocks(blocks_df: DataFrame,
                     columns: Optional[List[str]] = None) -> T.StructType:
    """Spark schema of the decoded table, read from one block's metadata
    (driver-side, payload columns pruned away)."""
    row = (blocks_df.selectExpr("columns.name as names",
                                "columns.arrow_type as types")
           .limit(1).collect())
    if not row:
        raise ValueError("blocks table is empty; pass an explicit schema")
    fields = []
    for name, ts in zip(row[0]["names"], row[0]["types"]):
        if columns is not None and name not in columns:
            continue
        fields.append(T.StructField(
            name, from_arrow_type(arrow_type_from_str(ts)), True))
    if columns is not None and not fields:
        raise ValueError(
            f"none of the requested columns {list(columns)} exist in the "
            f"blocks table (available: {list(row[0]['names'])})")
    return T.StructType(fields)


def _prefix_budgets(blocks_df: DataFrame, limit: int,
                    offset: int = 0) -> dict:
    """Per-block (skip, take) row windows covering rows
    [offset, offset + limit) in (part_id, seq) order. Metadata-only: the
    driver scan reads block_id/part_id/seq/n_rows (payload columns pruned
    away by the wide layout) and toLocalIterator stops pulling partitions
    once the window is covered."""
    from pyspark.sql import functions as F

    it = (blocks_df.select("block_id", "snapshot_id", "part_id", "seq",
                           "n_rows")
          .orderBy(F.asc("snapshot_id"), F.asc("part_id"), F.asc("seq"))
          .toLocalIterator())
    budgets: dict = {}
    to_skip = offset
    left = limit
    for r in it:
        nb = int(r["n_rows"])
        if to_skip >= nb:
            to_skip -= nb
            continue
        take = min(left, nb - to_skip)
        budgets[r["block_id"]] = (int(to_skip), int(take))
        to_skip = 0
        left -= take
        if left <= 0:
            break
    return budgets


def zone_filter(blocks_df: DataFrame, column: str, lo, hi) -> DataFrame:
    """Block-level predicate pushdown via zone maps: keep only blocks
    whose per-block min/max for `column` overlaps [lo, hi]. Integer-like
    columns use canonical-int64 bounds (for timestamps pass epoch
    micros); float columns use float bounds (pass lo/hi as floats).
    Blocks without bounds (unsupported domains, NaN-containing floats,
    old tables) are kept — pruning is only ever sound. The predicate runs
    on the metadata struct leaves, so the scan reads no payload bytes for
    pruned blocks; exact row filtering remains the caller's .filter on
    the decoded output."""
    from pyspark.sql import functions as F

    use_float = isinstance(lo, float) or isinstance(hi, float)
    mn, mx = ("min_f64", "max_f64") if use_float else ("min_i64", "max_i64")
    has = F.exists(F.col("columns"), lambda c: c["name"] == F.lit(column))
    ok = F.exists(
        F.col("columns"),
        lambda c: (c["name"] == F.lit(column))
        & (c[mn].isNull()
           | ((c[mx] >= F.lit(lo)) & (c[mn] <= F.lit(hi)))))
    # a column unknown to a block's metadata never prunes it (a typo'd
    # name must not silently drop every block)
    return blocks_df.where(~has | ok)


def zone_filter_eq(blocks_df: DataFrame, column: str, value) -> DataFrame:
    """Block-level EQUALITY pushdown via the per-block bloom sketch: keep
    only blocks whose bloom for `column` has all of the value's bits set
    (or no bloom at all — pruning is only ever sound). Bit tests are plain
    JVM shift/and expressions over the metadata array, so pruned blocks'
    payload bytes are never read. Exact row filtering remains the
    caller's .filter on the decoded output."""
    from pyspark.sql import functions as F

    from .blocks import bloom_positions

    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    positions = bloom_positions(value)

    def block_may_contain(c):
        bits = None
        for pos in positions:
            bit = (F.shiftright(c["bloom"][pos // 64], pos % 64)
                   .bitwiseAND(F.lit(1)) == 1)
            bits = bit if bits is None else (bits & bit)
        return c["bloom"].isNull() | bits

    has = F.exists(F.col("columns"), lambda c: c["name"] == F.lit(column))
    ok = F.exists(
        F.col("columns"),
        lambda c: (c["name"] == F.lit(column)) & block_may_contain(c))
    # unknown column names never prune (see zone_filter)
    return blocks_df.where(~has | ok)


def decode_blocks(blocks_df: DataFrame, schema: Optional[T.StructType] = None,
                  verify: bool = False,
                  columns: Optional[List[str]] = None,
                  compat: bool = False,
                  limit: Optional[int] = None,
                  offset: int = 0) -> DataFrame:
    """Decode a blocks DataFrame back into the original table.

    columns: optional projection — only these columns' payload/validity
    fields are selected, so the parquet scan never reads the other
    columns' bytes (per-column payload fields make pruning a plain
    Catalyst projection).

    compat=True enables schema evolution against the provided `schema`:
    block columns unknown to the schema are ignored, schema columns missing
    from a block are null-filled (the reference's indexed-optional-column
    forward/backward compatibility, re-expressed).

    limit=n (optionally with offset=m) decodes only rows
    [m, m + n) of the table (blocks ordered by part_id, seq) — the
    reference's take_n_finalize / lazy iteration re-expressed
    distributedly: a metadata-only pass picks the needed blocks +
    per-block (skip, take) windows, the payload scan is filtered to those
    block_ids (an isin predicate that reaches the parquet scan, so other
    blocks' payload bytes are never read), and inside a partially-needed
    block each codec decodes only the value range (rle/delta_rle cap run
    expansion, fsst/split touch only the range's body bytes). Partial
    blocks skip checksum verification (checksums cover whole columns).
    """
    target = None
    budgets = None
    if limit is not None:
        from pyspark.sql import functions as F

        budgets = _prefix_budgets(blocks_df, limit, offset)
        blocks_df = blocks_df.where(
            F.col("block_id").isin(list(budgets.keys())))
    if schema is None:
        schema = schema_of_blocks(blocks_df, columns)
    elif compat:
        from pyspark.sql.pandas.types import to_arrow_type

        target = pa.schema([pa.field(f.name, to_arrow_type(f.dataType))
                            for f in schema.fields])
    wanted = None
    if columns is not None:
        wanted = list(columns)
    elif compat and target is not None:
        wanted = [f.name for f in target]
    if wanted is not None:
        base = ["block_id", "snapshot_id", "part_id", "seq", "n_rows",
                "columns"]
        have = set(blocks_df.columns)
        keep = base + [f for c in wanted
                       for f in (payload_field(c), validity_field(c))
                       if f in have]
        blocks_df = blocks_df.select(*keep)
    return blocks_df.mapInArrow(
        make_decode_fn(verify, columns, target, budgets), schema)
