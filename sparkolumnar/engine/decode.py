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
from .blocks import (SKETCH_CODEC, arrow_type_from_str, canonical_checksum,
                     payload_field, validity_field)


def _compat_cast(arr: pa.Array, typ: pa.DataType) -> pa.Array:
    """Cast a decoded column to its compat-target type. Leaves use
    pyarrow's safe cast (always AFTER checksum verification, which runs on
    the stored type). pyarrow's cast refuses struct widening (adding
    fields), so containers are rebuilt child-wise: target children present
    in the source recurse, children added by a later schema generation
    null-fill, top-level validity is preserved — the reference's
    indexed-optional compatibility (compatible.rs:23-166) applied INSIDE
    container columns."""
    if arr.type.equals(typ):
        return arr
    if pa.types.is_struct(arr.type) and pa.types.is_struct(typ):
        have = {arr.type.field(i).name: arr.field(i)
                for i in range(arr.type.num_fields)}
        children = [(_compat_cast(have[f.name], f.type) if f.name in have
                     else pa.nulls(len(arr), f.type)) for f in typ]
        return pa.StructArray.from_arrays(
            children, fields=list(typ),
            mask=arr.is_null() if arr.null_count else None)
    try:
        return arr.cast(typ)
    except (pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError):
        # list/map whose element type needs a container rebuild
        # (e.g. list<struct> gaining a field)
        for is_kind, cls in ((pa.types.is_list, pa.ListArray),
                             (pa.types.is_large_list, pa.LargeListArray)):
            if is_kind(arr.type) and is_kind(typ):
                return cls.from_arrays(
                    arr.offsets, _compat_cast(arr.values, typ.value_type),
                    mask=arr.is_null() if arr.null_count else None)
        if pa.types.is_map(arr.type) and pa.types.is_map(typ):
            # MapArray.from_arrays has no mask parameter; rebuild from the
            # source's own validity+offsets buffers with recast entries.
            # Decoded arrays are freshly built (offset 0) — normalize via
            # slice-copy if ever not, so the buffers line up.
            if arr.offset:
                arr = arr.combine_chunks() if isinstance(
                    arr, pa.ChunkedArray) else pa.concat_arrays([arr])
            entries = pa.StructArray.from_arrays(
                [arr.keys, _compat_cast(arr.items, typ.item_type)],
                fields=[typ.key_field, typ.item_field])
            return pa.Array.from_buffers(
                typ, len(arr), arr.buffers()[:2],
                null_count=arr.null_count, children=[entries])
        raise


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
        if meta["codec"] == SKETCH_CODEC:
            continue  # sketch-only entry (struct-child zone map): no payload
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
        arrays = [_compat_cast(by_name[f.name], f.type) if f.name in by_name
                  else pa.nulls(k, f.type) for f in target]
        fields = list(target)
    return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))


_BASE_COLS = ("block_id", "snapshot_id", "part_id", "seq", "n_rows",
              "columns")

# merge-on-read deletes (engine/deletes.py): the OR-aggregated position
# bitmap joined onto the block scan, its popcount (budget pass only), and
# the physically-unique block coordinates the join is keyed by
DELETE_MASK_COL = "_del_mask"
DELETE_COUNT_COL = "_del_n"
COORD_COLS = ["snapshot_id", "part_id", "seq"]
# ship OR'd delete bitmaps in the task closure up to this many bytes
# (64k-row blocks carry 8 KiB bitmaps -> ~4k touched blocks); beyond it
# the bitmaps join onto the scan as a _del_mask column instead
_DELETE_CLOSURE_MAX_BYTES = 32 << 20


def make_decode_fn(verify: bool = False, columns: Optional[List[str]] = None,
                   target: Optional[pa.Schema] = None,
                   budgets: Optional[dict] = None,
                   del_masks: Optional[dict] = None):
    """budgets (partial decode): {(snapshot_id, part_id, seq): (skip, take)}
    — keyed by the physically-unique block coordinates, NOT block_id:
    block_id is content-addressed, so two byte-identical batches in one
    snapshot share one, and a block_id-keyed window would silently decode
    duplicates with the wrong (overwritten) window.

    del_masks (merge-on-read deletes, closure path): {(snapshot_id,
    part_id, seq): OR'd position bitmap} shipped in the task closure —
    the multi-MB payload binaries then never traverse a join operator
    (decode_blocks falls back to joining a _del_mask column onto the
    scan only when the aggregated bitmaps are too many to ship)."""
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for b in batches:
            names = b.schema.names
            # metadata columns go through to_pylist (small structs); the
            # multi-MB payload/validity binaries are accessed zero-copy via
            # Arrow buffers — to_pylist on those would copy every payload
            # into a Python bytes object before decoding. The delete
            # bitmap rides with the metadata (n_rows/8 bytes — tiny next
            # to payloads).
            meta_rows = b.select(
                [n for n in names
                 if n in _BASE_COLS or n == DELETE_MASK_COL]).to_pylist()
            pay_cols = [(n, b.column(i)) for i, n in enumerate(names)
                        if n not in _BASE_COLS and n != DELETE_MASK_COL]
            for j, row in enumerate(meta_rows):
                budget = None
                if budgets is not None:
                    budget = budgets.get(
                        (row["snapshot_id"], row["part_id"], row["seq"]))
                    if budget is None:
                        continue
                dmask = row.pop(DELETE_MASK_COL, None)
                if dmask is None and del_masks is not None:
                    dmask = del_masks.get(
                        (row["snapshot_id"], row["part_id"], row["seq"]))
                for name, col in pay_cols:
                    s = col[j]
                    row[name] = (memoryview(s.as_buffer())
                                 if s.is_valid else None)
                if dmask is None:
                    out = decode_block_row(row, verify=verify,
                                           columns=columns, target=target,
                                           budget=budget)
                else:
                    # merge-on-read deletes: decode the WHOLE block (so
                    # verify still checksums the stored columns), mask
                    # deleted rows out, and only then apply any (skip,
                    # take) budget — budgets count LIVE rows when deletes
                    # are present (decode_blocks computed them from
                    # n_rows - n_deleted)
                    out = decode_block_row(row, verify=verify,
                                           columns=columns, target=target)
                    bits = np.unpackbits(
                        np.frombuffer(dmask, np.uint8))[:row["n_rows"]]
                    out = out.filter(pa.array(~bits.astype(bool)))
                    if budget is not None:
                        skip, take = budget
                        out = out.slice(skip, take)
                if out.num_rows:
                    yield out

    return fn


def schema_of_blocks(blocks_df: DataFrame,
                     columns: Optional[List[str]] = None) -> T.StructType:
    """Spark schema of the decoded table, read from one block's metadata
    (driver-side, payload columns pruned away)."""
    row = (blocks_df.selectExpr("columns.name as names",
                                "columns.arrow_type as types",
                                "columns.codec as codecs")
           .limit(1).collect())
    if not row:
        raise ValueError("blocks table is empty; pass an explicit schema")
    fields = []
    for name, ts, codec in zip(row[0]["names"], row[0]["types"],
                               row[0]["codecs"]):
        if codec == SKETCH_CODEC:
            continue  # struct-child sketch entry: not a decodable column
        if columns is not None and name not in columns:
            continue
        fields.append(T.StructField(
            name, from_arrow_type(arrow_type_from_str(ts)), True))
    if columns is not None and not fields:
        raise ValueError(
            f"none of the requested columns {list(columns)} exist in the "
            f"blocks table (available: {list(row[0]['names'])})")
    return T.StructType(fields)


def _widen_numeric(a: pa.DataType, b: pa.DataType):
    """Wider of two same-family numeric types (the leaf evolution Iceberg
    permits: int -> long, float -> double, and the narrower widths below
    them), or None — signed/unsigned/float never mix, nothing non-numeric
    promotes."""
    def fam(t):
        if pa.types.is_signed_integer(t):
            return "i"
        if pa.types.is_unsigned_integer(t):
            return "u"
        if pa.types.is_floating(t):
            return "f"
        return None

    fa, fb = fam(a), fam(b)
    if fa is None or fa != fb:
        return None
    return a if a.bit_width >= b.bit_width else b


def _merge_arrow_types(a: pa.DataType, b: pa.DataType):
    """Evolution-merged type of two generations' arrow types, or None when
    they cannot combine: same-family numeric widening at the leaves,
    field-UNION for structs (a field present in only one generation is
    null-filled when decoding the other — the reference's indexed-optional
    compatibility, compatible.rs:23-166, applied inside containers),
    element recursion for (large_)lists and map values. Sound because
    decode_block_row compat-casts each block from its stored type AFTER
    checksum verification (_compat_cast rebuilds containers child-wise)."""
    if a.equals(b):
        return a
    num = _widen_numeric(a, b)
    if num is not None:
        return num
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        b_by = {f.name: f for f in b}
        a_names = {f.name for f in a}
        fields = []
        for f in a:
            if f.name in b_by:
                m = _merge_arrow_types(f.type, b_by[f.name].type)
                if m is None:
                    return None
                fields.append(pa.field(f.name, m))
            else:
                fields.append(pa.field(f.name, f.type))
        fields.extend(f for f in b if f.name not in a_names)
        return pa.struct(fields)
    for is_kind, ctor in ((pa.types.is_list, pa.list_),
                          (pa.types.is_large_list, pa.large_list)):
        if is_kind(a) and is_kind(b):
            m = _merge_arrow_types(a.value_type, b.value_type)
            if m is None:
                return None
            return ctor(pa.field(a.value_field.name, m))
    if pa.types.is_map(a) and pa.types.is_map(b):
        if not a.key_type.equals(b.key_type):
            return None
        m = _merge_arrow_types(a.item_type, b.item_type)
        if m is None:
            return None
        return pa.map_(a.key_type, m)
    return None


def _widen_types(type_strs):
    """Fold _merge_arrow_types over a column's observed type strings.
    collect_set order is nondeterministic, so the fold runs over
    (len, str)-sorted strings: deterministic output, and in the common
    append-a-field evolution the shorter (older) struct comes first, so
    added fields land after the original ones."""
    merged = None
    for s in sorted(set(type_strs), key=lambda s: (len(s), s)):
        t = arrow_type_from_str(s)
        if merged is None:
            merged = t
            continue
        merged = _merge_arrow_types(merged, t)
        if merged is None:
            return None
    return merged


def union_schema_of_blocks(blocks_df: DataFrame) -> T.StructType:
    """Union Spark schema across ALL blocks' metadata — for tables whose
    snapshots span schema generations (streaming schema evolution), where
    `schema_of_blocks`' single-block sample would miss later-added columns.
    One metadata-only distributed aggregate (payload columns pruned away by
    the wide layout); columns ordered by first position in a block then
    name, so appended columns land after the original ones. A column whose
    arrow type differs across generations resolves via _merge_arrow_types:
    the WIDEST type of a same-family numeric chain (int -> long,
    float -> double — the widening Iceberg permits), the field-UNION of
    struct generations (a struct may gain or lose fields; missing fields
    null-fill at decode), recursively through list elements and map
    values; any other conflict raises."""
    from pyspark.sql import functions as F

    rows = (blocks_df
            .select(F.posexplode("columns").alias("pos", "c"))
            .where(F.col("c.codec") != SKETCH_CODEC)
            .groupBy(F.col("c.name").alias("name"))
            .agg(F.min("pos").alias("pos"),
                 F.collect_set("c.arrow_type").alias("types"))
            .orderBy("pos", "name").collect())
    if not rows:
        raise ValueError("blocks table is empty; pass an explicit schema")
    fields = []
    for r in rows:
        if len(r["types"]) == 1:
            typ = arrow_type_from_str(r["types"][0])
        else:
            typ = _widen_types(r["types"])
            if typ is None:
                raise ValueError(
                    f"column {r['name']!r} has conflicting arrow types "
                    f"across blocks: {sorted(r['types'])} — only "
                    "same-family numeric widening, struct field-union and "
                    "list/map element recursion are supported; decode "
                    "each schema generation separately")
        fields.append(T.StructField(r["name"], from_arrow_type(typ), True))
    return T.StructType(fields)


def _prefix_budgets(blocks_df: DataFrame, limit: int,
                    offset: int = 0) -> dict:
    """Per-block (skip, take) row windows covering rows
    [offset, offset + limit) in (part_id, seq) order, keyed by the unique
    (snapshot_id, part_id, seq) coordinates.

    Distributed two-level scheme — the driver never walks per-block
    metadata outside the window (a toLocalIterator over every block
    preceding a large offset would make the driver the bottleneck at
    ~10^8 blocks):

      1. one metadata-only job aggregates row counts per
         (snapshot_id, part_id) — driver rows ∝ physical partitions,
         not blocks (payload columns pruned away by the wide layout);
      2. the driver prefix-sums the sorted partition counts to find the
         contiguous partition range overlapping the row window;
      3. a second job, bounded to exactly that partition range by a
         constant-size pushed predicate, fetches only the window
         partitions' block coordinates for the exact per-block split.
    """
    from pyspark.sql import functions as F

    per_part = (blocks_df.groupBy("snapshot_id", "part_id")
                .agg(F.sum("n_rows").alias("rows")).collect())
    per_part.sort(key=lambda r: (r["snapshot_id"], int(r["part_id"])))
    needed = []
    rows_before = 0  # rows in partitions preceding the first needed one
    cum = 0
    for r in per_part:
        n = int(r["rows"])
        if cum + n <= offset:
            cum += n
            rows_before = cum
            continue
        needed.append((r["snapshot_id"], int(r["part_id"])))
        cum += n
        if cum >= offset + limit:
            break
    if not needed:
        return {}
    # the needed partitions are CONTIGUOUS in (snapshot_id, part_id)
    # order, so a lexicographic range predicate selects them exactly,
    # stays constant-size, and pushes down to the metadata scan
    s, p = F.col("snapshot_id"), F.col("part_id")
    (s0, p0), (s1, p1) = needed[0], needed[-1]
    ge = (s > s0) | ((s == s0) & (p >= p0))
    le = (s < s1) | ((s == s1) & (p <= p1))
    blk = (blocks_df.where(ge & le)
           .select("snapshot_id", "part_id", "seq", "n_rows").collect())
    blk.sort(key=lambda r: (r["snapshot_id"], int(r["part_id"]),
                            int(r["seq"])))
    budgets: dict = {}
    to_skip = offset - rows_before
    left = limit
    for r in blk:
        nb = int(r["n_rows"])
        if to_skip >= nb:
            to_skip -= nb
            continue
        take = min(left, nb - to_skip)
        budgets[(r["snapshot_id"], int(r["part_id"]), int(r["seq"]))] = (
            int(to_skip), int(take))
        to_skip = 0
        left -= take
        if left <= 0:
            break
    return budgets


def _budget_range_pred(lo: tuple, hi: tuple):
    """Scan predicate selecting blocks whose (snapshot_id, part_id, seq)
    lies in the closed lexicographic range [lo, hi]. The selected window is
    CONTIGUOUS in that order by construction (_prefix_budgets walks the
    sorted block list), so a constant-size range comparison replaces a
    potentially-huge isin literal — and its leaf comparisons push down to
    the parquet scan no matter how many blocks the window spans."""
    from pyspark.sql import functions as F

    s, p, q = F.col("snapshot_id"), F.col("part_id"), F.col("seq")

    def ge(t):
        return ((s > t[0]) | ((s == t[0]) &
                              ((p > t[1]) | ((p == t[1]) & (q >= t[2])))))

    def le(t):
        return ((s < t[0]) | ((s == t[0]) &
                              ((p < t[1]) | ((p == t[1]) & (q <= t[2])))))

    return ge(lo) & le(hi)


def _col_cond(column: str, per_elem):
    """Block-keep condition: the metadata element for `column` satisfies
    per_elem(c). A column unknown to a block's metadata never prunes it
    (a typo'd name must not silently drop every block)."""
    from pyspark.sql import functions as F

    has = F.exists(F.col("columns"), lambda c: c["name"] == F.lit(column))
    ok = F.exists(
        F.col("columns"),
        lambda c: (c["name"] == F.lit(column)) & per_elem(c))
    return ~has | ok


def _range_elem(lo, hi, use_float: bool):
    """Per-element keep condition: the block's numeric zone map overlaps
    [lo, hi] (or carries no bounds — pruning is only ever sound)."""
    from pyspark.sql import functions as F

    mn, mx = ("min_f64", "max_f64") if use_float else ("min_i64", "max_i64")

    def g(c):
        cond = None
        if lo is not None:
            cond = c[mx] >= F.lit(lo)
        if hi is not None:
            upper = c[mn] <= F.lit(hi)
            cond = upper if cond is None else (cond & upper)
        if cond is None:
            return F.lit(True)
        return c[mn].isNull() | cond

    return g


def _str_range_elem(lo, hi):
    """Per-element keep condition for string/binary RANGE predicates over
    the truncated-prefix bounds (min_bin <= values <= max_bin, see
    blocks.prefix_lower/prefix_upper). Spark's BinaryType comparison is
    unsigned lexicographic — the same order as the raw utf-8 bytes and as
    the string's code points, so `url >= lo` prunes correctly. Each side
    degrades independently when its bound is null (old table, or the
    upper-bound increment overflowed)."""
    from pyspark.sql import functions as F

    def g(c):
        conds = []
        if hi is not None:
            # prune when min_bin > hi: min_bin <= true min, so true min > hi
            conds.append(c["min_bin"].isNull() | (c["min_bin"] <= F.lit(hi)))
        if lo is not None:
            # prune when max_bin < lo: max_bin >= true max, so true max < lo
            conds.append(c["max_bin"].isNull() | (c["max_bin"] >= F.lit(lo)))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for e in conds[1:]:
            out = out & e
        return out

    return g


def _bloom_elem(value: bytes):
    """Per-element keep condition: the block's bloom sketch may contain
    `value` (all of its bit positions set), or the block has no bloom.
    Bit tests are plain JVM shift/and expressions over the metadata."""
    from pyspark.sql import functions as F

    from .blocks import bloom_positions

    positions = bloom_positions(value)

    def g(c):
        bits = None
        for pos in positions:
            bit = (F.shiftright(c["bloom"][pos // 64], pos % 64)
                   .bitwiseAND(F.lit(1)) == 1)
            bits = bit if bits is None else (bits & bit)
        return c["bloom"].isNull() | bits

    return g


def zone_filter(blocks_df: DataFrame, column: str, lo, hi) -> DataFrame:
    """Block-level predicate pushdown via zone maps: keep only blocks
    whose per-block min/max for `column` overlaps [lo, hi]. Integer-like
    columns use canonical-int64 bounds (for timestamps pass epoch
    micros); float columns use float bounds (pass lo/hi as floats).
    Blocks without bounds (unsupported domains, NaN-containing floats,
    old tables) are kept — pruning is only ever sound. The predicate runs
    on the metadata struct leaves, so the scan reads no payload bytes for
    pruned blocks; exact row filtering remains the caller's .filter on
    the decoded output (or use decode_blocks(filters=) which does both).

    lo=None / hi=None leave that side unbounded (one-sided predicates)."""
    use_float = isinstance(lo, float) or isinstance(hi, float)
    return blocks_df.where(_col_cond(column, _range_elem(lo, hi, use_float)))


def _meta_fields_of(blocks_df: DataFrame) -> frozenset:
    """Field names available in the per-column metadata struct — older
    snapshots (written before a sketch family existed, e.g. pre-prefix-
    bounds tables) lack some fields, and referencing an absent struct
    field is an ANALYSIS error in Spark, not a null. Pruning degrades
    per sketch family on these tables instead of failing the query."""
    try:
        t = blocks_df.schema["columns"].dataType.elementType
        return frozenset(t.fieldNames())
    except Exception:
        return frozenset()


def zone_filter_eq(blocks_df: DataFrame, column: str, value) -> DataFrame:
    """Block-level EQUALITY pushdown via the per-block bloom sketch: keep
    only blocks whose bloom for `column` has all of the value's bits set
    (or no bloom at all — pruning is only ever sound), AND whose prefix
    zone bounds admit the value (when the table carries them). Pruned
    blocks' payload bytes are never read. Exact row filtering remains
    the caller's .filter on the decoded output."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    cond = _col_cond(column, _bloom_elem(value))
    if {"min_bin", "max_bin"} <= _meta_fields_of(blocks_df):
        cond = cond & _col_cond(column, _str_range_elem(value, value))
    return blocks_df.where(cond)


def _canon_zone_value(value, arrow_type_str: str, session_tz=None):
    """Memoizing front for _canon_zone_value_impl: the direct decode
    path evaluates the same filter leaves once PER BLOCK (block_keep_py
    in the task loop), and re-parsing an ISO timestamp or re-scaling a
    Decimal 10^5 times per part is pure overhead. Predicate values are
    hashable in practice (str/int/float/datetime/date/Decimal/bytes);
    anything unhashable falls through to the direct computation."""
    try:
        return _canon_zone_value_cached(value, arrow_type_str, session_tz)
    except TypeError:
        return _canon_zone_value_impl(value, arrow_type_str, session_tz)


def _canon_zone_value_impl(value, arrow_type_str: str, session_tz=None):
    """Convert a Python predicate value to the canonical zone-map bound of
    the column's arrow type — the exact int64 mapping the encoder's
    _zone_minmax derives through codecs.core.to_int64 (timestamps in the
    stored unit, date32 in days, decimals unscaled) or a float for float
    columns. Returns None when the column's type carries no zone map
    (bool/uint64/nested; strings/binary have their own prefix bounds) OR
    when the value cannot be converted to the column's canonical domain
    (e.g. an arbitrary string against an int column): pruning then
    degrades soundly to the exact post-filter instead of raising —
    decode_job --eq passes raw CLI strings straight through here.
    ISO-format strings are accepted for timestamp/date columns.

    session_tz: Spark session timezone. Pruning must canonicalize each
    literal kind exactly as Spark's exact filter will interpret it, or
    the zone bound disagrees with the predicate by a tz offset and
    matching blocks are silently dropped. Spark's rules (mirrored here):
    an ISO STRING against a tz-aware timestamp column casts in the
    SESSION timezone; a naive Python datetime literal goes through
    TimestampType.toInternal, i.e. time.mktime = the SYSTEM timezone;
    aware datetimes are instants. Naive (NTZ) columns stay wall-clock
    for both literal kinds."""
    import datetime as dt
    from decimal import Decimal, InvalidOperation

    t = arrow_type_str
    try:
        if t.startswith("timestamp["):
            parts = [p.strip()
                     for p in t[len("timestamp["):-1].split(",")]
            unit = parts[0]
            has_tz = any(p.startswith("tz=") for p in parts[1:])
            from_string = isinstance(value, str)
            if from_string:
                value = dt.datetime.fromisoformat(value)
            if isinstance(value, dt.datetime):
                if value.tzinfo is None and has_tz:
                    if from_string:
                        # Spark casts string literals in the SESSION tz
                        if session_tz:
                            from zoneinfo import ZoneInfo

                            value = value.replace(
                                tzinfo=ZoneInfo(session_tz))
                    else:
                        # naive datetime literals go through
                        # TimestampType.toInternal = time.mktime: the
                        # SYSTEM timezone (astimezone() on a naive
                        # datetime applies exactly that)
                        value = value.astimezone()
                epoch = (dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
                         if value.tzinfo is not None
                         else dt.datetime(1970, 1, 1))
                us = (value - epoch) // dt.timedelta(microseconds=1)
            else:
                us = int(value)  # already epoch micros
            if unit == "ns":
                return us * 1_000
            return us // {"s": 1_000_000, "ms": 1_000, "us": 1}[unit]
        if t == "date32[day]":
            if isinstance(value, str):
                value = dt.date.fromisoformat(value)
            if isinstance(value, dt.date):
                return (value - dt.date(1970, 1, 1)).days
            return int(value)
        if t == "date64[ms]":
            if isinstance(value, str):
                value = dt.date.fromisoformat(value)
            if isinstance(value, dt.date):
                return (value - dt.date(1970, 1, 1)).days * 86_400_000
            return int(value)
        if t.startswith("decimal128("):
            p, s = t[len("decimal128("):-1].split(",")
            if int(p) > 18:
                return None
            return int(Decimal(value).scaleb(int(s)).to_integral_value())
        if t in ("int8", "int16", "int32", "int64",
                 "uint8", "uint16", "uint32"):
            return int(value)
        if t in ("float", "double"):
            return float(value)
    except (ValueError, TypeError, OverflowError, InvalidOperation,
            KeyError):  # KeyError: ZoneInfoNotFoundError subclasses it
        return None
    return None


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=4096)
def _canon_zone_value_cached(value, arrow_type_str, session_tz):
    return _canon_zone_value_impl(value, arrow_type_str, session_tz)


def _blocks_arrow_types(blocks_df: DataFrame) -> dict:
    """{column name: arrow type string} from one block's metadata
    (driver-side, payload columns pruned away)."""
    row = (blocks_df.selectExpr("columns.name as names",
                                "columns.arrow_type as types")
           .limit(1).collect())
    if not row:
        return {}
    return dict(zip(row[0]["names"], row[0]["types"]))


_FILTER_OPS = ("between", "=", "==", "!=", ">=", "<=", ">", "<", "in",
               "not in", "is_null", "is_not_null", "starts_with")
_NULLARY_OPS = ("is_null", "is_not_null")
_STR_TYPES = ("string", "large_string", "binary", "large_binary")
_PREPASS_MAX_PARTS = 4096  # isin cap before degrading to a min/max range


def _normalize_filters(filters):
    """Normalize a filters= value to DNF — a list of AND-groups, OR'd
    together (pyarrow's parquet-filters convention):

        [(c, op, v), ...]            one conjunction (ANDed)
        [[(...), ...], [(...)]]      OR of conjunctions

    Validates ops and value arity; "in" takes one list/tuple/set value."""
    if not filters:
        return []
    if all(isinstance(f, (list, tuple)) and len(f) > 0
           and isinstance(f[0], (list, tuple)) for f in filters):
        groups = [list(g) for g in filters]
    elif all(isinstance(f, (list, tuple)) and len(f) > 0
             and isinstance(f[0], str) for f in filters):
        groups = [list(filters)]
    else:
        raise ValueError(
            "filters must be a list of (col, op, value) tuples, or a "
            "list of such lists (OR of AND-groups)")
    for g in groups:
        if not g:
            raise ValueError("filters: empty AND-group")
        for flt in g:
            col, op, vals = flt[0], flt[1], flt[2:]
            if op not in _FILTER_OPS:
                raise ValueError(
                    f"unsupported filter op {op!r} (one of {_FILTER_OPS})")
            want = (2 if op == "between"
                    else 0 if op in _NULLARY_OPS else 1)
            if len(vals) != want:
                raise ValueError(f"filter {flt!r}: wrong number of values")
            if op in ("in", "not in") and not isinstance(
                    vals[0], (list, tuple, set, frozenset)):
                raise ValueError(
                    f"filter {flt!r}: {op!r} takes one list/tuple/set value")
    return groups


def filter_columns_of(filters) -> List[str]:
    """Ordered unique column names a filters= value references."""
    seen, out = set(), []
    for g in _normalize_filters(filters):
        for flt in g:
            if flt[0] not in seen:
                seen.add(flt[0])
                out.append(flt[0])
    return out


def filter_root_columns_of(filters, types: dict) -> List[str]:
    """Top-level DECODE columns the filter leaves need: a dotted leaf
    ("meta.n_chars", a struct-child sketch) decodes its root column —
    the child has no payload of its own. A dotted name that is itself a
    top-level column (no root entry in the metadata) stays as-is."""
    seen, out = set(), []
    for c in filter_columns_of(filters):
        root = c.split(".", 1)[0]
        use = root if ("." in c and root in types) else c
        if use not in seen:
            seen.add(use)
            out.append(use)
    return out


def _str_probe_bytes(v):
    if isinstance(v, str):
        return v.encode("utf-8", "surrogatepass")
    return v if isinstance(v, (bytes, bytearray)) else None


def _prefix_excl_upper(b: bytes):
    """Smallest byte string strictly greater than EVERY value carrying
    prefix `b` (increment the last non-0xff byte, drop the tail) —
    `starts_with p` is then exactly the range [p, upper). None when b
    is all 0xff: the prefix range is upper-unbounded. Sound against the
    truncated 32-byte zone bounds for any prefix length: min_bin <=
    true min and max_bin >= true max, so max_bin < p proves no value
    reaches p, and min_bin > upper proves every value passed the last
    prefix-p string."""
    p = bytearray(b)
    for i in range(len(p) - 1, -1, -1):
        if p[i] != 0xFF:
            p[i] += 1
            return bytes(p[:i + 1])
    return None


_ALL_META_FIELDS = frozenset((
    "name", "codec", "arrow_type", "n_nulls", "bytes_in", "bytes_out",
    "checksum_in", "min_i64", "max_i64", "min_f64", "max_f64", "bloom",
    "min_bin", "max_bin"))


def _eq_block_cond(col: str, v, t: str, is_str: bool,
                   fields: frozenset = _ALL_META_FIELDS,
                   session_tz=None):
    """Block-keep condition for `col == v`, or None (no pruning)."""
    if is_str:
        b = _str_probe_bytes(v)
        if b is None:
            return None
        conds = []
        if "bloom" in fields:
            conds.append(_col_cond(col, _bloom_elem(bytes(b))))
        if {"min_bin", "max_bin"} <= fields:
            conds.append(_col_cond(col, _str_range_elem(bytes(b),
                                                        bytes(b))))
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    c = _canon_zone_value(v, t, session_tz)
    if c is None:
        return None
    return _col_cond(col, _range_elem(c, c, isinstance(c, float)))


def _not_all_null_elem(c):
    """Per-element keep: the block holds at least one NON-null value.
    Sound extra prune for every value-comparison op (=, <, between, in,
    !=, not in): SQL null comparisons never match, so an all-null block
    (n_nulls == n_rows) cannot satisfy any of them. n_rows is the
    block row's top-level column — an outer reference inside the
    exists() lambda."""
    from pyspark.sql import functions as F

    return c["n_nulls"].isNull() | (c["n_nulls"] < F.col("n_rows"))


def _const_block_ne_elem(col_vals, t, is_str, session_tz):
    """Per-element keep condition for `col != v` / `col NOT IN vals`:
    prune a block only when it is PROVABLY constant-equal to a listed
    value — zone min == max == v with zero nulls. For string/binary the
    proof needs untruncated bounds: min_bin == max_bin == v with
    len(v) < prefix width implies the true min and max both equal v
    (a longer true min would leave a full-width prefix; an incremented
    truncated upper bound strictly exceeds the true max). Inconvertible
    values are skipped (no pruning from them), never pruned on.
    Returns the elem lambda, or None if no value yields a proof."""
    from pyspark.sql import functions as F

    from .blocks import _ZONE_PREFIX_BYTES

    checks = []  # (mn_field, mx_field, lit) triples proving constancy
    for v in col_vals:
        if is_str:
            b = _str_probe_bytes(v)
            if b is None or len(b) >= _ZONE_PREFIX_BYTES:
                continue
            checks.append(("min_bin", "max_bin", F.lit(bytes(b))))
        else:
            cv = _canon_zone_value(v, t, session_tz)
            if cv is None:
                continue
            mn, mx = (("min_f64", "max_f64") if isinstance(cv, float)
                      else ("min_i64", "max_i64"))
            checks.append((mn, mx, F.lit(cv)))
    if not checks:
        return None

    def g(c):
        const_eq = None
        for mn, mx, lit in checks:
            e = (c[mn] == lit) & (c[mx] == lit)
            const_eq = e if const_eq is None else (const_eq | e)
        allv = (c["n_nulls"] == 0) & const_eq
        # null zone fields (sketchless older block) must KEEP: guard
        # before negating, or ~null -> null reads as prune in exists()
        return c["n_nulls"].isNull() | ~F.coalesce(allv, F.lit(False))

    return g


def _leaf_block_cond(flt, types: dict,
                     fields: frozenset = _ALL_META_FIELDS,
                     session_tz=None):
    """Block-keep condition for one (col, op, ...) filter, or None when
    the combination supports no pruning (unknown column, value not
    convertible to the column's canonical domain) — the exact post-filter
    then carries the predicate alone, which is always sound."""
    from pyspark.sql import functions as F

    col, op, vals = flt[0], flt[1], list(flt[2:])
    t = types.get(col)
    if t is None:
        return None
    has_nn = "n_nulls" in fields
    if op == "is_null":
        # a block with zero nulls in this column cannot match
        if not has_nn:
            return None
        return _col_cond(col, lambda c: (c["n_nulls"].isNull()
                                         | (c["n_nulls"] > 0)))
    if op == "is_not_null":
        if not has_nn:
            return None
        return _col_cond(col, _not_all_null_elem)
    # every remaining op is a value comparison: an all-null block can
    # never match it, whatever the zone maps say
    nan_cond = (_col_cond(col, _not_all_null_elem) if has_nn else None)

    def with_nan(cond):
        if cond is None:
            return nan_cond
        return cond if nan_cond is None else (cond & nan_cond)

    is_str = t in _STR_TYPES
    if op in ("!=", "not in"):
        values = vals[0] if op == "not in" else [vals[0]]
        if not values:  # NOT IN (): vacuously true, even for nulls
            return None
        elem = _const_block_ne_elem(values, t, is_str, session_tz)
        return with_nan(_col_cond(col, elem) if elem is not None else None)
    if op == "in":
        # bloom/zone-probe each value, union the survivors: a block is
        # kept iff SOME listed value may be present in it
        conds = []
        for v in vals[0]:
            c = _eq_block_cond(col, v, t, is_str, fields, session_tz)
            if c is None:
                return with_nan(None)
            conds.append(c)
        if not conds:  # IN () matches nothing: prune every block
            return F.lit(False)
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return with_nan(out)
    if op in ("=", "=="):
        return with_nan(
            _eq_block_cond(col, vals[0], t, is_str, fields, session_tz))
    if op == "starts_with":
        # prefix probe == the range [p, incremented-prefix) over the
        # truncated string zone bounds; non-string columns get no
        # pruning (the exact filter alone carries the predicate)
        if not is_str or not ({"min_bin", "max_bin"} <= fields):
            return with_nan(None)
        b = _str_probe_bytes(vals[0])
        if b is None:
            return with_nan(None)
        return with_nan(_col_cond(col, _str_range_elem(
            bytes(b), _prefix_excl_upper(bytes(b)))))
    lo = hi = None
    if op == "between":
        lo, hi = vals
    elif op in (">=", ">"):
        lo = vals[0]
    else:
        hi = vals[0]
    # strict ops keep the closed zone bound (sound: may keep one
    # boundary block too many, never drops a needed one)
    if is_str:
        if not ({"min_bin", "max_bin"} <= fields):
            # pre-prefix-bounds table: no string range pruning
            return with_nan(None)
        lo_b = _str_probe_bytes(lo) if lo is not None else None
        hi_b = _str_probe_bytes(hi) if hi is not None else None
        if lo_b is None and hi_b is None:
            return with_nan(None)
        return with_nan(_col_cond(col, _str_range_elem(
            bytes(lo_b) if lo_b is not None else None,
            bytes(hi_b) if hi_b is not None else None)))
    lo_c = _canon_zone_value(lo, t, session_tz) if lo is not None else None
    hi_c = _canon_zone_value(hi, t, session_tz) if hi is not None else None
    if lo_c is None and hi_c is None:
        return with_nan(None)
    use_float = isinstance(lo_c, float) or isinstance(hi_c, float)
    return with_nan(_col_cond(col, _range_elem(lo_c, hi_c, use_float)))


def block_keep_py(cols_meta, filters, types: dict = None,
                  session_tz=None, n_rows=None) -> bool:
    """Driver/task-side Python twin of _apply_block_filters for ONE
    block's metadata (`cols_meta`: the block row's `columns` list of
    dicts): True when the block may hold matching rows. Same soundness
    rules as the Spark expressions — unknown columns, missing sketches
    and inconvertible values never prune. Used by the zero-IPC direct
    decode path, where pruning must run inside the task against pyarrow
    metadata rows instead of in a Spark where(). types defaults to the
    block's own self-describing metadata; session_tz carries the Spark
    session timezone so naive datetime/ISO values canonicalize exactly
    as the Spark-side pruning does (see _canon_zone_value)."""
    from .blocks import bloom_positions

    groups = _normalize_filters(filters)
    if not groups:
        return True
    by_name = {c["name"]: c for c in cols_meta}
    if types is None:
        types = {c["name"]: c["arrow_type"] for c in cols_meta}

    def rng_keep(c, lo, hi, use_float):
        mn = c.get("min_f64" if use_float else "min_i64")
        mx = c.get("max_f64" if use_float else "max_i64")
        if mn is None:  # no zone map: keep
            return True
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
        return True

    def str_rng_keep(c, lo, hi):
        if hi is not None and c.get("min_bin") is not None \
                and bytes(c["min_bin"]) > hi:
            return False
        if lo is not None and c.get("max_bin") is not None \
                and bytes(c["max_bin"]) < lo:
            return False
        return True

    def bloom_keep(c, b):
        words = c.get("bloom")
        if words is None:
            return True
        for pos in bloom_positions(b):
            if not (words[pos // 64] >> (pos % 64)) & 1:
                return False
        return True

    def eq_keep(col, v, t, is_str):
        c = by_name[col]
        if is_str:
            b = _str_probe_bytes(v)
            if b is None:
                return None
            b = bytes(b)
            return bloom_keep(c, b) and str_rng_keep(c, b, b)
        cv = _canon_zone_value(v, t, session_tz)
        if cv is None:
            return None
        return rng_keep(c, cv, cv, isinstance(cv, float))

    def const_ne_keep(c, values, t, is_str):
        """!= / NOT IN verdict: prune only a provably constant block
        whose single value is listed (see _const_block_ne_elem for the
        string untruncated-bounds proof); inconvertible values skip."""
        from .blocks import _ZONE_PREFIX_BYTES

        if c.get("n_nulls") != 0:
            return None
        for v in values:
            if is_str:
                b = _str_probe_bytes(v)
                if b is None or len(b) >= _ZONE_PREFIX_BYTES:
                    continue
                b = bytes(b)
                mn, mx = c.get("min_bin"), c.get("max_bin")
                if mn is not None and bytes(mn) == b \
                        and mx is not None and bytes(mx) == b:
                    return False
            else:
                cv = _canon_zone_value(v, t, session_tz)
                if cv is None:
                    continue
                k = "f64" if isinstance(cv, float) else "i64"
                if c.get(f"min_{k}") == cv and c.get(f"max_{k}") == cv:
                    return False
        return None

    def leaf_keep(flt):
        """True/False = prunable verdict; None = no pruning possible."""
        col, op, vals = flt[0], flt[1], list(flt[2:])
        t = types.get(col)
        if t is None or col not in by_name:
            return None
        c = by_name[col]
        nn = c.get("n_nulls")
        if op == "is_null":
            return None if nn is None else nn > 0
        if op == "is_not_null":
            if nn is None or n_rows is None:
                return None
            return nn < n_rows
        # NOT IN () is vacuously TRUE for every row — nulls included — so
        # it must escape the all-null prune below (exact_filter_mask_py
        # keeps every row of an all-null block for it; _leaf_block_cond
        # already ordered these checks this way)
        if op == "not in" and not vals[0]:
            return None
        # value comparisons never match an all-null block
        if nn is not None and n_rows is not None and nn >= n_rows:
            return False
        is_str = t in _STR_TYPES
        if op in ("!=", "not in"):
            values = vals[0] if op == "not in" else [vals[0]]
            return const_ne_keep(c, values, t, is_str)
        if op == "in":
            any_keep = False
            for v in vals[0]:
                k = eq_keep(col, v, t, is_str)
                if k is None:
                    return None
                any_keep = any_keep or k
            return any_keep if vals[0] else False
        if op in ("=", "=="):
            return eq_keep(col, vals[0], t, is_str)
        if op == "starts_with":
            if not is_str:
                return None
            b = _str_probe_bytes(vals[0])
            if b is None:
                return None
            b = bytes(b)
            return str_rng_keep(c, b, _prefix_excl_upper(b))
        lo = hi = None
        if op == "between":
            lo, hi = vals
        elif op in (">=", ">"):
            lo = vals[0]
        else:
            hi = vals[0]
        if is_str:
            lo_b = _str_probe_bytes(lo) if lo is not None else None
            hi_b = _str_probe_bytes(hi) if hi is not None else None
            if lo_b is None and hi_b is None:
                return None
            return str_rng_keep(c, lo_b and bytes(lo_b),
                                hi_b and bytes(hi_b))
        lo_c = (_canon_zone_value(lo, t, session_tz)
                if lo is not None else None)
        hi_c = (_canon_zone_value(hi, t, session_tz)
                if hi is not None else None)
        if lo_c is None and hi_c is None:
            return None
        return rng_keep(c, lo_c, hi_c,
                        isinstance(lo_c, float) or isinstance(hi_c, float))

    for g in groups:
        verdicts = [leaf_keep(flt) for flt in g]
        known = [v for v in verdicts if v is not None]
        if not known or all(known):
            return True  # this OR-branch may match the block
    return False


def _coerce_py_value(v, typ, session_tz=None):
    """Coerce a Python predicate value to arrow type `typ`, mirroring
    Spark's implicit literal casts (ISO strings to timestamps/dates,
    numeric strings to numbers; naive datetimes against tz-aware columns
    interpreted in the SESSION timezone, exactly as Spark casts the same
    literal). Raises ValueError when the value cannot represent the type
    — callers map that to an all-false leaf, matching Spark's
    cast-to-null -> no-match semantics."""
    import datetime as dt
    from decimal import Decimal, InvalidOperation

    try:
        if isinstance(v, dt.datetime) and pa.types.is_timestamp(typ):
            if v.tzinfo is None and typ.tz is not None:
                # naive datetime literal: SYSTEM tz (Spark's
                # TimestampType.toInternal uses time.mktime)
                return v.astimezone()
            return v
        if isinstance(v, str):
            if pa.types.is_timestamp(typ):
                d = dt.datetime.fromisoformat(v)
                if d.tzinfo is None and typ.tz is not None and session_tz:
                    # string literal: SESSION tz (Spark cast semantics)
                    from zoneinfo import ZoneInfo

                    d = d.replace(tzinfo=ZoneInfo(session_tz))
                return d
            if pa.types.is_date(typ):
                return dt.date.fromisoformat(v)
            if pa.types.is_integer(typ):
                return int(v)
            if pa.types.is_floating(typ):
                return float(v)
            if pa.types.is_decimal(typ):
                return Decimal(v)
            if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                return v.encode("utf-8", "surrogatepass")
        return v
    except (ValueError, TypeError, InvalidOperation, KeyError) as e:
        raise ValueError(str(e)) from None


def exact_filter_mask_py(batch, filters, session_tz=None):
    """pyarrow boolean mask applying `filters` exactly to a decoded
    RecordBatch (SQL semantics: null comparisons never match; a literal
    that cannot be cast to the column type matches nothing, as Spark's
    cast-to-null does) — the task-side twin of _exact_filter_expr for
    the direct decode path. session_tz: see _coerce_py_value."""
    import pyarrow.compute as pc

    def resolve(col):
        idx = batch.schema.get_field_index(col)
        if idx >= 0:
            return batch.column(idx)
        if "." in col:
            # dotted struct-child access, SQL semantics: a null parent
            # reads as a null child (arrow's child buffers are physically
            # independent of the parent's validity — mask them)
            parts = col.split(".")
            idx = batch.schema.get_field_index(parts[0])
            if idx >= 0:
                a = batch.column(idx)
                for p in parts[1:]:
                    if pa.types.is_struct(a.type) \
                            and a.type.get_field_index(p) >= 0:
                        parent_valid = a.is_valid()
                        a = a.field(p)
                        a = pc.if_else(parent_valid, a,
                                       pa.nulls(len(a), a.type))
                    elif pa.types.is_map(a.type) \
                            and pa.types.is_string(a.type.key_type):
                        # Spark's GetMapValue: first match, null when the
                        # key is absent or the map is null — map_lookup
                        # has exactly these semantics
                        a = pc.map_lookup(
                            a, query_key=pa.scalar(p, a.type.key_type),
                            occurrence="first")
                    else:
                        break
                else:
                    return a
        # get_field_index returns -1, which would silently select the
        # LAST column — fail loudly instead
        raise KeyError(
            f"filter column {col!r} not in decoded batch "
            f"(have {batch.schema.names})")

    def leaf(flt):
        col, op, vals = flt[0], flt[1], list(flt[2:])
        a = resolve(col)
        none_match = pa.array([False] * len(a), pa.bool_())

        def sc(v):
            return pa.scalar(_coerce_py_value(v, a.type, session_tz),
                             type=a.type)

        try:
            if op == "is_null":
                return pc.is_null(a)
            if op == "is_not_null":
                return pc.is_valid(a)
            if op == "not in":
                vlist = []
                for v in vals[0]:
                    try:
                        cv = pa.scalar(
                            _coerce_py_value(v, a.type, session_tz),
                            type=a.type).as_py()
                    except (ValueError, pa.lib.ArrowInvalid,
                            pa.lib.ArrowTypeError):
                        # a literal whose cast nulls out makes the whole
                        # NOT IN unknown for every row (Spark/SQL): no
                        # row matches — the OPPOSITE of the 'in' rule
                        return none_match
                    if cv is None:
                        # explicit NULL literal: x NOT IN (v, NULL) is
                        # never TRUE under three-valued logic (same as a
                        # null-coerced cast; the IPC path's ~isin agrees)
                        return none_match
                    vlist.append(cv)
                if not vlist:  # NOT IN (): vacuously true, nulls too
                    return pa.array([True] * len(a), pa.bool_())
                return pc.and_kleene(
                    pc.invert(pc.is_in(a, value_set=pa.array(
                        vlist, type=a.type))),
                    pc.is_valid(a))
            if op == "between":
                return pc.and_kleene(pc.greater_equal(a, sc(vals[0])),
                                     pc.less_equal(a, sc(vals[1])))
            if op in ("=", "=="):
                return pc.equal(a, sc(vals[0]))
            if op == "!=":
                return pc.not_equal(a, sc(vals[0]))
            if op == "starts_with":
                v = vals[0]
                if pa.types.is_string(a.type) \
                        or pa.types.is_large_string(a.type):
                    pat = (v if isinstance(v, str)
                           else bytes(v).decode("utf-8", "surrogatepass"))
                    return pc.starts_with(a, pattern=pat)
                if pa.types.is_binary(a.type) \
                        or pa.types.is_large_binary(a.type):
                    # byte-exact prefix compare (MatchSubstringOptions
                    # would round-trip the pattern through utf-8)
                    b = (v.encode("utf-8", "surrogatepass")
                         if isinstance(v, str) else bytes(v))
                    return pc.equal(pc.binary_slice(a, 0, len(b)),
                                    pa.scalar(b, type=a.type))
                # non-string column: mirror Spark's implicit cast
                pat = v if isinstance(v, str) else str(v)
                return pc.starts_with(pc.cast(a, pa.string()), pattern=pat)
            if op == "in":
                # coerce each IN value INDIVIDUALLY: Spark casts a bad
                # literal to null and the rest of the list still
                # matches — one garbage value must not turn the whole
                # leaf into all-False (it would silently drop rows the
                # valid values match)
                vlist = []
                for v in vals[0]:
                    try:
                        vlist.append(pa.scalar(
                            _coerce_py_value(v, a.type, session_tz),
                            type=a.type).as_py())
                    except (ValueError, pa.lib.ArrowInvalid,
                            pa.lib.ArrowTypeError):
                        continue
                if not vlist:
                    return none_match
                return pc.is_in(a, value_set=pa.array(vlist, type=a.type))
            fn = {">=": pc.greater_equal, "<=": pc.less_equal,
                  ">": pc.greater, "<": pc.less}[op]
            return fn(a, sc(vals[0]))
        except (ValueError, pa.lib.ArrowInvalid, pa.lib.ArrowTypeError):
            return none_match

    or_mask = None
    for g in _normalize_filters(filters):
        m = None
        for flt in g:
            e = leaf(flt)
            m = e if m is None else pc.and_kleene(m, e)
        or_mask = m if or_mask is None else pc.or_kleene(or_mask, m)
    # null (unknown) never matches, as in SQL
    return pc.fill_null(or_mask, False)


def _apply_block_filters(blocks_df: DataFrame, filters, types: dict):
    """Block-level pruning for decode_blocks(filters=): every leaf is
    translated to its zone-map / bloom / prefix-bound pushdown where the
    type supports one; leaves within a group AND, groups OR. Pruning is
    only ever sound — a group with no prunable leaf disables pruning
    entirely (any block might satisfy that OR-branch), and the exact
    post-filter always applies. Accepts raw or normalized filters.
    Sketch families absent from the table's metadata struct (older
    snapshots) simply don't prune — never an analysis error."""
    groups = _normalize_filters(filters)
    fields = _meta_fields_of(blocks_df)
    try:
        session_tz = blocks_df.sparkSession.conf.get(
            "spark.sql.session.timeZone")
    except Exception:
        session_tz = None
    or_cond = None
    for g in groups:
        gc = None
        for flt in g:
            c = _leaf_block_cond(flt, types, fields, session_tz)
            if c is not None:
                gc = c if gc is None else (gc & c)
        if gc is None:
            return blocks_df
        or_cond = gc if or_cond is None else (or_cond | gc)
    if or_cond is None:
        return blocks_df
    return blocks_df.where(or_cond)


def _partition_prepass(pruned_df: DataFrame) -> DataFrame:
    """Metadata pre-pass turning block-level pruning into PARTITION
    pruning: one driver-small job over the metadata leaves (payload
    columns pruned away by the wide layout) finds the lexicographic
    (snapshot_id, part_id) range that still holds surviving blocks, and
    the payload scan is additionally bounded to that range. The blocks
    table is written partitioned by (snapshot_id, part_id)
    (engine/tableio.py), so this predicate prunes whole DIRECTORIES at
    the scan — with a range-clustered encode (encode_table cluster_by=)
    a narrow time-range probe then never lists, opens, or reads the
    payload bytes of the other partitions. Sound for any filter: the
    partition set only ever over-approximates the surviving blocks, and
    the block-level zone/bloom predicate still applies inside it.

    The surviving partitions are enumerated exactly (an isin on the
    partition columns, bounded by the number of physical partitions, not
    blocks); beyond _PREPASS_MAX_PARTS the pre-pass degrades to the
    lexicographic (snapshot_id, part_id) min/max range so the predicate
    stays constant-size."""
    from pyspark.sql import functions as F

    rows = (pruned_df.select("snapshot_id", "part_id").distinct()
            .limit(_PREPASS_MAX_PARTS + 1).collect())
    if not rows:  # every block pruned
        return pruned_df.where(F.lit(False))
    s, p = F.col("snapshot_id"), F.col("part_id")
    if len(rows) > _PREPASS_MAX_PARTS:
        row = (pruned_df
               .agg(F.min(F.struct("snapshot_id", "part_id")).alias("lo"),
                    F.max(F.struct("snapshot_id", "part_id")).alias("hi"))
               .collect()[0])
        lo, hi = row["lo"], row["hi"]
        ge = (s > lo[0]) | ((s == lo[0]) & (p >= lo[1]))
        le = (s < hi[0]) | ((s == hi[0]) & (p <= hi[1]))
        return pruned_df.where(ge & le)
    by_snap: dict = {}
    for r in rows:
        by_snap.setdefault(r["snapshot_id"], []).append(r["part_id"])
    pred = None
    for snap, parts in by_snap.items():
        e = (s == snap) & p.isin(parts)
        pred = e if pred is None else (pred | e)
    return pruned_df.where(pred)


def _exact_filter_expr(filters):
    """The row-exact predicate equivalent of a filters= value (AND
    within a group, OR across groups). Accepts raw or normalized."""
    from pyspark.sql import functions as F

    groups = _normalize_filters(filters)
    or_expr = None
    for g in groups:
        expr = None
        for flt in g:
            col, op, vals = F.col(flt[0]), flt[1], list(flt[2:])
            if op == "between":
                e = col.between(vals[0], vals[1])
            elif op in ("=", "=="):
                e = col == vals[0]
            elif op == "!=":
                e = col != vals[0]
            elif op == "in":
                vlist = list(vals[0])
                e = col.isin(vlist) if vlist else F.lit(False)
            elif op == "not in":
                # Spark's native semantics: a null column value — or a
                # literal its cast nulls out — makes the NOT IN unknown,
                # so the row never matches; NOT IN () is vacuously true
                vlist = list(vals[0])
                e = ~col.isin(vlist) if vlist else F.lit(True)
            elif op == "is_null":
                e = col.isNull()
            elif op == "is_not_null":
                e = col.isNotNull()
            elif op == "starts_with":
                # F.startswith supports STRING and BINARY natively
                e = F.startswith(col, F.lit(vals[0]))
            elif op == ">=":
                e = col >= vals[0]
            elif op == "<=":
                e = col <= vals[0]
            elif op == ">":
                e = col > vals[0]
            else:
                e = col < vals[0]
            expr = e if expr is None else (expr & e)
        or_expr = expr if or_expr is None else (or_expr | expr)
    return or_expr


def decode_blocks(blocks_df: DataFrame, schema: Optional[T.StructType] = None,
                  verify: bool = False,
                  columns: Optional[List[str]] = None,
                  compat: bool = False,
                  limit: Optional[int] = None,
                  offset: int = 0,
                  filters=None,
                  prepass: bool = True,
                  deletes: Optional[DataFrame] = None) -> DataFrame:
    """Decode a blocks DataFrame back into the original table.

    columns: optional projection — only these columns' payload/validity
    fields are selected, so the parquet scan never reads the other
    columns' bytes (per-column payload fields make pruning a plain
    Catalyst projection).

    filters: optional list of predicates, each a tuple
        (column, op, value)            op in  = == != >= <= > <
        (column, "between", lo, hi)
        (column, "in", [v1, v2, ...])
        (column, "not in", [v1, ...])  null literals match nothing
        (column, "is_null")            prunes every n_nulls == 0 block
        (column, "is_not_null")        prunes every all-null block
    ANDed together — or a LIST OF SUCH LISTS, meaning OR of the AND
    groups (pyarrow's parquet-filters DNF convention). Every predicate
    is applied EXACTLY on the decoded rows, and — this is the point of
    passing it here instead of .filter()ing the decoded output — the
    engine first prunes whole blocks via the per-block zone maps
    (range/equality on integer-like and float columns; truncated-prefix
    bounds for ranges on string/binary columns such as url) and bloom
    sketches (equality/IN on string/binary columns — each IN value is
    probed and the surviving blocks unioned), so pruned blocks' payload
    bytes are never read or decoded.
    Timestamp/date/decimal values are converted to the canonical zone
    bounds automatically; pass the natural Python values (datetime,
    date, Decimal, int, float, str). At 100 TB this is the difference
    between scanning 1% and 100% of the payloads; a .filter() above the
    opaque decode UDF cannot prune anything. prepass=True (default) adds
    a metadata-only pre-pass that bounds the payload scan to the
    surviving (snapshot_id, part_id) range — directory-level partition
    pruning on range-clustered tables (see _partition_prepass); pass
    prepass=False to keep the decode fully lazy (no driver job at plan
    time).

    compat=True enables schema evolution against the provided `schema`:
    block columns unknown to the schema are ignored, schema columns missing
    from a block are null-filled (the reference's indexed-optional-column
    forward/backward compatibility, re-expressed).

    deletes: optional merge-on-read position-delete rows (DELETES_SCHEMA,
    written by engine.deletes.delete_where / TableIO.read_deletes()).
    Bitmaps are OR-aggregated per block and BROADCAST-joined onto the
    block scan by the physically-unique (snapshot_id, part_id, seq)
    coordinates — payload bytes never shuffle — and deleted rows are
    masked out AFTER decode and checksum verification (checksums cover
    the stored columns). Composes with filters (they see live rows
    only), compat, verify, projection, and limit/offset (budgets count
    LIVE rows).

    limit=n (optionally with offset=m) decodes only rows
    [m, m + n) of the table (blocks ordered by snapshot_id, part_id, seq)
    — the reference's take_n_finalize / lazy iteration re-expressed
    distributedly: a metadata-only pass picks the needed blocks +
    per-block (skip, take) windows keyed by the unique
    (snapshot_id, part_id, seq) coordinates, the payload scan is filtered
    to the window's contiguous coordinate range (a constant-size pushed
    predicate, so other blocks' payload bytes are never read), and inside
    a partially-needed block each codec decodes only the value range
    (rle/delta_rle cap run expansion, fsst/split touch only the range's
    body bytes). Partial edge blocks skip checksum verification
    (checksums cover whole columns; whole blocks in the window are still
    verified) — a warning is emitted when verify=True is combined with
    limit=. When filters are also given, limit counts MATCHING rows:
    the blocks are pruned and exact-filtered first, then limited.
    """
    from pyspark.sql import functions as F

    target = None
    budgets = None
    schema_src = blocks_df  # infer the schema before any pruning can
    #                         empty the frame (limit past EOF, filters
    #                         pruning everything) — empty result, not error
    exact = None
    del_agg = None
    if deletes is not None:
        from .deletes import aggregate_deletes

        del_agg = aggregate_deletes(deletes)
    if filters:
        groups = _normalize_filters(filters)
        types = _blocks_arrow_types(blocks_df)
        blocks_df = _apply_block_filters(blocks_df, groups, types)
        if prepass:
            blocks_df = _partition_prepass(blocks_df)
        exact = _exact_filter_expr(groups)
    if limit is not None and exact is None:
        budget_src = blocks_df
        if del_agg is not None:
            # budgets count LIVE rows: subtract each block's delete
            # popcount before the prefix walk (the decode fn mirrors this
            # by masking first, then slicing the (skip, take) window)
            budget_src = (blocks_df.join(
                F.broadcast(del_agg.select(*COORD_COLS, DELETE_COUNT_COL)),
                COORD_COLS, "left")
                .withColumn("n_rows", F.col("n_rows") - F.coalesce(
                    F.col(DELETE_COUNT_COL), F.lit(0))))
        budgets = _prefix_budgets(budget_src, limit, offset)
        if budgets:
            keys = list(budgets)  # insertion order == sorted block order
            blocks_df = blocks_df.where(_budget_range_pred(keys[0], keys[-1]))
        else:
            blocks_df = blocks_df.where(F.lit(False))
        if verify:
            import warnings

            warnings.warn(
                "decode_blocks(limit=) with verify=True: partially-decoded "
                "edge blocks skip checksum verification (checksums cover "
                "whole columns); whole blocks in the window are verified",
                stacklevel=2)
    if schema is None:
        schema = schema_of_blocks(schema_src, columns)
    elif compat:
        from pyspark.sql.pandas.types import to_arrow_type

        target = pa.schema([pa.field(f.name, to_arrow_type(f.dataType))
                            for f in schema.fields])
    # projection: filter columns must be decoded for the exact predicate;
    # add them to the decode set, then drop them after filtering
    out_cols = None
    dec_columns = columns
    if exact is not None and target is not None:
        missing = [c for c in filter_root_columns_of(filters, types)
                   if c not in {fl.name for fl in target}]
        if missing:
            raise ValueError(
                f"compat decode with filters: filter columns {missing} "
                f"must be part of the provided schema")
    if exact is not None and columns is not None:
        # dotted struct-child leaves decode their ROOT column
        fcols = filter_root_columns_of(filters, types)
        missing = [c for c in fcols if c not in columns]
        if missing:
            out_cols = list(columns)
            dec_columns = list(columns) + missing
            schema = schema_of_blocks(schema_src, dec_columns)
    wanted = None
    if dec_columns is not None:
        wanted = list(dec_columns)
    elif compat and target is not None:
        wanted = [f.name for f in target]
    if wanted is not None:
        base = list(_BASE_COLS)
        have = set(blocks_df.columns)
        keep = base + [f for c in wanted
                       for f in (payload_field(c), validity_field(c))
                       if f in have]
        blocks_df = blocks_df.select(*keep)
    del_masks = None
    if del_agg is not None:
        # preferred: ship the OR'd bitmaps in the task closure (they are
        # n_rows/8 bytes per TOUCHED block) — the multi-MB payload
        # binaries then never traverse a join operator, which measured
        # ~34% decode overhead at 1M rows from copying every payload
        # through the BroadcastHashJoin's row pipeline. Fall back to
        # joining a _del_mask column onto the scan only when the bitmap
        # set is too large to ship (pervasive deletes across a huge
        # table — the state Iceberg tells you to compact away too).
        size = del_agg.agg(
            F.count("*").alias("b"),
            F.sum(F.octet_length(DELETE_MASK_COL)).alias("sz")
        ).collect()[0]
        if int(size["sz"] or 0) <= _DELETE_CLOSURE_MAX_BYTES:
            del_masks = {
                (r["snapshot_id"], r["part_id"], r["seq"]):
                    bytes(r[DELETE_MASK_COL])
                for r in del_agg.collect()} or None
        else:
            # broadcast hash join keyed by the physically-unique
            # coordinates: the payload scan never shuffles, each task
            # looks its blocks' bitmaps up locally (Iceberg's per-task
            # delete-file loading)
            blocks_df = blocks_df.join(
                F.broadcast(del_agg.select(*COORD_COLS, DELETE_MASK_COL)),
                COORD_COLS, "left")
    out = blocks_df.mapInArrow(
        make_decode_fn(verify, dec_columns, target, budgets,
                       del_masks=del_masks), schema)
    if exact is not None:
        out = out.where(exact)
        if out_cols is not None:
            out = out.select(*out_cols)
        if limit is not None:
            if offset:
                out = out.offset(offset)
            out = out.limit(limit)
    return out
