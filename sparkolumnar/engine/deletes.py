"""Merge-on-read row-level deletes — Iceberg v2 position-delete files
(public spec) re-expressed for the blocks layout.

delete_where() never rewrites a data block: it decodes ONLY the
predicate's columns from blocks that survive the same zone/bloom/prefix
pruning as a filtered read, evaluates the predicate exactly (the same
exact_filter_mask_py the direct decode path uses), and emits ONE small
row per MATCHED block: the block coordinates plus an MSB-first position
bitmap (bit i set = row i of the block is deleted). Readers OR all
bitmaps per block and mask rows out AFTER decode — and after checksum
verification, which covers the stored column as written —
decode_blocks(deletes=...). compact_snapshot applies the bitmaps
physically and retires them.

Scale notes (the 100 TB design):

* the delete scan shuffles NOTHING — blocks are pruned on metadata,
  only the predicate columns' payload bytes are read/decoded in-task,
  and the output is ~n_rows/8 bytes per matched block;
* read-time apply is a BROADCAST join of the aggregated bitmaps onto
  the block scan keyed by the physically-unique (snapshot_id, part_id,
  seq) coordinates — the multi-MB payload bytes never shuffle. Bitmaps
  are tiny (8 KiB per 64k-row block), but pervasive deletes across a
  whole 100 TB table should be compacted away rather than broadcast
  forever — the same operational rule Iceberg applies to its delete
  files;
* delete ops are idempotent: bitmaps OR at read time, so re-running a
  crashed delete appends an identical bitmap and changes nothing;
* deletes are keyed by block COORDINATES (not content-addressed
  block_id: two byte-identical blocks in one snapshot share a
  block_id, and each must carry its own bitmap), so a compacted NEW
  snapshot can never inherit an old snapshot's delete rows.

Reference parity note: the reference has no deletes (its whole public
API is columnar/src/lib.rs:114-133); this is engine-extension scope.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .blocks import payload_field, validity_field
from .decode import COORD_COLS, DELETE_COUNT_COL, DELETE_MASK_COL

DELETES_SCHEMA = T.StructType([
    T.StructField("block_id", T.StringType(), False),
    T.StructField("snapshot_id", T.StringType(), False),
    T.StructField("part_id", T.IntegerType(), False),
    T.StructField("seq", T.IntegerType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_deleted", T.LongType(), False),
    # MSB-first bitmap over the block's stored row order (np.packbits):
    # bit i set = row i deleted; length ceil(n_rows / 8)
    T.StructField("positions", T.BinaryType(), False),
])

_DELETES_ARROW = pa.schema([
    pa.field("block_id", pa.string()),
    pa.field("snapshot_id", pa.string()),
    pa.field("part_id", pa.int32()),
    pa.field("seq", pa.int32()),
    pa.field("n_rows", pa.int64()),
    pa.field("n_deleted", pa.int64()),
    pa.field("positions", pa.binary()),
])


def _mark_rows_fn(groups, fcols, null_fill: dict, session_tz):
    """mapInArrow fn over a (pruned, projected) block scan: decode the
    predicate columns of each block, evaluate the predicate exactly, and
    emit a position-bitmap row per block with >= 1 match. null_fill maps
    predicate root columns to their arrow type so a schema generation
    that predates the column evaluates it as all-null (the same
    cross-generation semantics the filtered read has)."""
    from .decode import _BASE_COLS, decode_block_row, exact_filter_mask_py

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            names = b.schema.names
            meta_rows = b.select(
                [n for n in names if n in _BASE_COLS]).to_pylist()
            pay_cols = [(n, b.column(i)) for i, n in enumerate(names)
                        if n not in _BASE_COLS]
            out = {f.name: [] for f in _DELETES_ARROW}
            for j, row in enumerate(meta_rows):
                for name, col in pay_cols:
                    s = col[j]
                    row[name] = (memoryview(s.as_buffer())
                                 if s.is_valid else None)
                present = {m["name"] for m in row["columns"]}
                have = [c for c in fcols if c in present]
                n = row["n_rows"]
                # a generation that predates EVERY predicate column still
                # needs an n-row batch of nulls (IS NULL must match it)
                arrays, names_out = [], []
                if have:
                    dec = decode_block_row(row, columns=have)
                    arrays, names_out = list(dec.columns), list(
                        dec.schema.names)
                for c in fcols:
                    if c not in present:
                        arrays.append(pa.nulls(n, null_fill[c]))
                        names_out.append(c)
                dec = pa.RecordBatch.from_arrays(arrays, names=names_out)
                mask = pc.fill_null(
                    exact_filter_mask_py(dec, groups, session_tz), False)
                bits = np.asarray(mask).astype(bool)
                n_del = int(bits.sum())
                if not n_del:
                    continue
                out["block_id"].append(row["block_id"])
                out["snapshot_id"].append(row["snapshot_id"])
                out["part_id"].append(row["part_id"])
                out["seq"].append(row["seq"])
                out["n_rows"].append(n)
                out["n_deleted"].append(n_del)
                out["positions"].append(np.packbits(bits).tobytes())
            if out["block_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out[f.name], f.type) for f in _DELETES_ARROW],
                    schema=_DELETES_ARROW)

    return fn


def compute_deletes(blocks_df: DataFrame, filters,
                    prepass: bool = True) -> DataFrame:
    """Position-delete rows (DELETES_SCHEMA) for every block row matching
    `filters` (decode_blocks' predicate grammar, DNF). Pure-DataFrame:
    blocks are pruned with the SAME zone/bloom/prefix sketch machinery as
    a filtered read, so untouched blocks never have a payload byte read;
    survivors decode ONLY the predicate's root columns.

    A block whose schema generation predates a predicate column
    evaluates that column as all-null (null comparisons never match —
    IS NULL deletes DO reach old generations, exactly like the read
    path's cross-generation filter semantics).

    blocks_df must be MATERIALIZED blocks (TableIO.read_blocks — the
    delete_where path — or a persisted/collected DataFrame), never a
    still-lazy encode_table plan: bitmaps are keyed by (snapshot_id,
    part_id, seq), and encode derives part_id from the task's
    partition id, which plan composition renumbers — a union of two
    delete scans over one lazy encode offsets the second branch's
    partition ids (Spark concatenates union partitions), silently
    producing bitmaps that match no block at read time. Stored tables
    pin their coordinates at write; that is the supported shape."""
    from .decode import (_BASE_COLS, _apply_block_filters,
                         _blocks_arrow_types, _normalize_filters,
                         _partition_prepass, arrow_type_from_str,
                         filter_root_columns_of)

    if not filters:
        raise ValueError("delete_where needs a predicate — refusing to "
                         "delete every row of the table implicitly")
    groups = _normalize_filters(filters)
    types = _blocks_arrow_types(blocks_df)
    fcols = filter_root_columns_of(filters, types)
    unknown = [c for c in fcols if c not in types]
    if unknown:
        raise ValueError(
            f"delete predicate columns {unknown} not in the blocks table "
            f"(available: {sorted(types)})")
    null_fill = {c: arrow_type_from_str(types[c]) for c in fcols}
    try:
        session_tz = blocks_df.sparkSession.conf.get(
            "spark.sql.session.timeZone")
    except Exception:
        session_tz = None
    pruned = _apply_block_filters(blocks_df, groups, types)
    if prepass:
        pruned = _partition_prepass(pruned)
    have = set(pruned.columns)
    keep = list(_BASE_COLS) + [f for c in fcols
                               for f in (payload_field(c),
                                         validity_field(c))
                               if f in have]
    return pruned.select(*keep).mapInArrow(
        _mark_rows_fn(groups, fcols, null_fill, session_tz),
        DELETES_SCHEMA)


def _mark_keys_fn(on: str, keys_pa):
    """mapInArrow fn: decode ONLY the key column of each block and emit a
    bitmap row for rows whose key is in the broadcast key set (a pyarrow
    array in the closure; vectorized pc.is_in per block — zero shuffle).
    A null stored key never matches (SQL join semantics; the key set was
    null-stripped by the caller). Blocks from a schema generation
    without the key column cannot match and emit nothing."""
    from .decode import _BASE_COLS, decode_block_row

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        cast_keys: dict = {}
        for b in batches:
            names = b.schema.names
            meta_rows = b.select(
                [n for n in names if n in _BASE_COLS]).to_pylist()
            pay_cols = [(n, b.column(i)) for i, n in enumerate(names)
                        if n not in _BASE_COLS]
            out = {f.name: [] for f in _DELETES_ARROW}
            for j, row in enumerate(meta_rows):
                if not any(m["name"] == on for m in row["columns"]):
                    continue
                for name, col in pay_cols:
                    s = col[j]
                    row[name] = (memoryview(s.as_buffer())
                                 if s.is_valid else None)
                dec = decode_block_row(row, columns=[on])
                vals = dec.column(0)
                vset = cast_keys.get(str(vals.type))
                if vset is None:
                    vset = (keys_pa if keys_pa.type == vals.type
                            else keys_pa.cast(vals.type))
                    cast_keys[str(vals.type)] = vset
                mask = pc.fill_null(pc.is_in(vals, value_set=vset), False)
                bits = np.asarray(mask).astype(bool)
                n_del = int(bits.sum())
                if not n_del:
                    continue
                out["block_id"].append(row["block_id"])
                out["snapshot_id"].append(row["snapshot_id"])
                out["part_id"].append(row["part_id"])
                out["seq"].append(row["seq"])
                out["n_rows"].append(row["n_rows"])
                out["n_deleted"].append(n_del)
                out["positions"].append(np.packbits(bits).tobytes())
            if out["block_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out[f.name], f.type) for f in _DELETES_ARROW],
                    schema=_DELETES_ARROW)

    return fn


def _emit_key_rows_fn(ons):
    """mapInArrow fn: decode ONLY the key column(s) and emit one
    (coords, pos, keys...) row per stored row — the probe side of the
    shuffle-join delete path. block_id deliberately does NOT ride these
    rows (a 64-char string per stored row would dominate the shuffle);
    the caller joins it back from the tiny blocks metadata after the
    per-block re-pack."""
    from .decode import _BASE_COLS, decode_block_row

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            names = b.schema.names
            meta_rows = b.select(
                [n for n in names if n in _BASE_COLS]).to_pylist()
            pay_cols = [(n, b.column(i)) for i, n in enumerate(names)
                        if n not in _BASE_COLS]
            for j, row in enumerate(meta_rows):
                present = {m["name"] for m in row["columns"]}
                if any(c not in present for c in ons):
                    continue
                for name, col in pay_cols:
                    s = col[j]
                    row[name] = (memoryview(s.as_buffer())
                                 if s.is_valid else None)
                dec = decode_block_row(row, columns=list(ons))
                by_name = {n: dec.column(i)
                           for i, n in enumerate(dec.schema.names)}
                n = row["n_rows"]
                yield pa.RecordBatch.from_arrays(
                    [pa.array([row["snapshot_id"]] * n),
                     pa.array(np.full(n, row["part_id"], np.int32)),
                     pa.array(np.full(n, row["seq"], np.int32)),
                     pa.array(np.full(n, n, np.int64)),
                     pa.array(np.arange(n, dtype=np.int64))]
                    + [by_name[c] for c in ons],
                    names=["snapshot_id", "part_id", "seq",
                           "n_rows", "_pos"]
                    + [f"_key{i}" for i in range(len(ons))])

    return fn


def compute_deletes_by_keys(blocks_df: DataFrame, keys_df: DataFrame,
                            on,
                            broadcast_threshold: int = 500_000
                            ) -> DataFrame:
    """Position-delete rows for every stored row whose `on` value(s)
    appear in keys_df — the MERGE/upsert delete primitive (Iceberg
    would write equality-delete files here; positions keep the read
    path single-mechanism). `on` is a column name or a list of names
    (composite merge keys).

    Two physical strategies:

    * single-column key with <= broadcast_threshold distinct values:
      the keys ship to every task (Arrow-collected once, vectorized
      pc.is_in per block) — each block scan decodes ONLY the key column
      and emits its bitmap in-task, ZERO shuffle (Iceberg's broadcast
      MERGE shape);
    * otherwise (big key set, or composite keys): each block emits
      slim (coords, pos, keys) rows for a left-semi shuffle join
      against the keys, surviving positions re-pack to bitmaps per
      block, and block_id rejoins from the tiny blocks metadata — one
      shuffle of the key column(s), the same cost every engine pays
      for a big MERGE.

    A row with a NULL in ANY key component never matches (SQL join
    semantics). Blocks from a schema generation missing a key column
    cannot match. blocks_df must be materialized blocks (see
    compute_deletes)."""
    from .decode import _blocks_arrow_types

    ons = [on] if isinstance(on, str) else list(on)
    types = _blocks_arrow_types(blocks_df)
    missing = [c for c in ons if c not in types]
    if missing:
        raise ValueError(f"merge key(s) {missing} not in the blocks "
                         f"table (available: {sorted(types)})")
    if list(keys_df.columns) != ons:
        keys_df = keys_df.select(*ons)
    keys_df = keys_df.distinct()
    have = set(blocks_df.columns)
    keep = list(_base_and_payload(ons, have))
    scan = blocks_df.select(*keep)
    if len(ons) == 1:
        n_keys = keys_df.count()
        if n_keys <= broadcast_threshold:
            keys_pa = keys_df.toArrow().column(0).combine_chunks()
            keys_pa = keys_pa.drop_null()
            return scan.mapInArrow(_mark_keys_fn(ons[0], keys_pa),
                                   DELETES_SCHEMA)

    key_fields = [T.StructField(f"_key{i}", _spark_type_of(types[c]), True)
                  for i, c in enumerate(ons)]
    rows = scan.mapInArrow(
        _emit_key_rows_fn(ons),
        T.StructType([f for f in DELETES_SCHEMA
                      if f.name not in ("block_id", "n_deleted",
                                        "positions")]
                     + [T.StructField("_pos", T.LongType(), False)]
                     + key_fields))
    renamed = keys_df
    for i, c in enumerate(ons):
        renamed = renamed.withColumnRenamed(c, f"_key{i}")
    # null key components never match: semi-join equality is null-safe
    # FALSE in Spark, so nulls drop out of the join naturally
    hit = rows.join(renamed, [f"_key{i}" for i in range(len(ons))],
                    "left_semi")

    pack_schema = T.StructType([f for f in DELETES_SCHEMA
                                if f.name != "block_id"])

    def _pack(pdf):
        import pandas as pd

        n = int(pdf["n_rows"].iloc[0])
        bits = np.zeros(n, bool)
        bits[pdf["_pos"].to_numpy()] = True
        return pd.DataFrame({
            "snapshot_id": [pdf["snapshot_id"].iloc[0]],
            "part_id": [pdf["part_id"].iloc[0]],
            "seq": [pdf["seq"].iloc[0]],
            "n_rows": [n],
            "n_deleted": [int(bits.sum())],
            "positions": [np.packbits(bits).tobytes()]})

    packed = hit.groupBy(*COORD_COLS).applyInPandas(_pack, pack_schema)
    meta = blocks_df.select(*COORD_COLS, "block_id")
    return (packed.join(F.broadcast(meta), COORD_COLS, "inner")
            .select(*[f.name for f in DELETES_SCHEMA]))


def _base_and_payload(cols, have):
    from .decode import _BASE_COLS

    cols = [cols] if isinstance(cols, str) else list(cols)
    out = list(_BASE_COLS)
    for c in cols:
        for f in (payload_field(c), validity_field(c)):
            if f in have:
                out.append(f)
    return out


def _spark_type_of(arrow_type_str: str):
    """Spark DataType for a stored column's arrow type string."""
    from pyspark.sql.pandas.types import from_arrow_type

    from .decode import arrow_type_from_str

    return from_arrow_type(arrow_type_from_str(arrow_type_str))


def aggregate_deletes(deletes_df: DataFrame) -> DataFrame:
    """OR all delete bitmaps per block coordinate: one row per touched
    block with the merged mask and its popcount (exact even when delete
    ops overlap). Grouped shuffle over the small delete rows only."""
    out_schema = T.StructType(
        [f for f in DELETES_SCHEMA if f.name in COORD_COLS]
        + [T.StructField(DELETE_MASK_COL, T.BinaryType(), False),
           T.StructField(DELETE_COUNT_COL, T.LongType(), False)])

    def _or_group(pdf):
        import pandas as pd

        arrs = [np.frombuffer(b, np.uint8) for b in pdf["positions"]]
        acc = np.zeros(max(len(a) for a in arrs), np.uint8)
        for a in arrs:
            acc[:len(a)] |= a
        n_rows = int(pdf["n_rows"].max())
        n_del = int(np.unpackbits(acc)[:n_rows].sum())
        return pd.DataFrame({
            "snapshot_id": [pdf["snapshot_id"].iloc[0]],
            "part_id": [pdf["part_id"].iloc[0]],
            "seq": [pdf["seq"].iloc[0]],
            DELETE_MASK_COL: [acc.tobytes()],
            DELETE_COUNT_COL: [n_del]})

    return (deletes_df.groupBy(*COORD_COLS)
            .applyInPandas(_or_group, out_schema))


def delete_where(io, filters, merge_schema: bool = False) -> dict:
    """Predicate delete against a TableIO table: compute position-delete
    bitmaps for every stored row matching `filters` and APPEND them to
    the table's deletes file set (<base>/deletes). No data block is
    rewritten; readers that pass the deletes to decode_blocks(deletes=)
    — the decode_job default — stop seeing the rows immediately;
    compact_snapshot makes it physical.

    Idempotent: re-running the same predicate appends bitmaps that OR to
    no change. Returns {"n_blocks_matched", "n_rows_matched"} — rows
    matching the predicate among STORED rows (a row already deleted by
    an earlier op still counts here; popcounts after OR stay exact).

    merge_schema=True: evolve-aware scan, needed when the predicate
    column was added by a later schema generation."""
    dels = compute_deletes(io.read_blocks(merge_schema=merge_schema),
                           filters).persist()
    try:
        io.write_deletes(dels)
        stats = dels.agg(F.count("*").alias("b"),
                         F.sum("n_deleted").alias("r")).collect()[0]
    finally:
        dels.unpersist()
    written = io.read_deletes()
    return {"n_blocks_matched": int(stats["b"] or 0),
            "n_rows_matched": int(stats["r"] or 0),
            "delete_rows_total": int(written.count()) if written is not None
            else 0}
