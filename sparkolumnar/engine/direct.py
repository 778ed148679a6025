"""Scan-in-UDF / write-in-UDF direct paths: the IPC-floor answer.

Measured on this host (BENCH/BASELINE.md "IPC floor"): a NOOP python
mapInArrow over the fast-encode plan costs ~90% of the whole job — the
table bytes pay the JVM->Python Arrow IPC serialization on the way in and
the encoded payloads pay it again on the way out. At 100 TB that double
serialization is the dominant cost the engine controls.

The direct paths remove BOTH crossings for shuffle-free jobs: Spark
distributes only the parquet FILE LIST (driver-small rows), and each task

  * opens its files with pyarrow directly (no JVM scan, no IPC-in),
  * encodes/decodes batches with the same codec engine,
  * writes its output parquet file itself (no IPC-out, no JVM writer),

returning only per-partition metadata to the driver. This is the right
shape whenever the job needs no row shuffle: encode in storage order
(or on an input that is already clustered), decode-to-parquet. The
shuffled layouts (key= / cluster_by=) inherently require row transport
and keep the mapInArrow path.

Exactly-once: the task's output file name is a pure function of
(snapshot_id, part_id); writes go to a temp file + os.replace (atomic on
posix), so a retried task idempotently overwrites its own output, and the
checkpoint protocol is the same as engine/lineage.py — file groups are
the partitions. The blocks files land inside TableIO's hive layout
(blocks/snapshot_id=<s>/part_id=<p>/) WITHOUT the two partition columns
in the file, exactly as Spark writes them, so read_blocks()/decode_blocks
see one coherent table regardless of which path produced each partition.

At real scale the local-path file access generalizes: pyarrow.dataset
speaks s3/hdfs/gcs through fsspec/Arrow filesystems; only _local_path's
scheme handling would grow.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Sequence

import pyarrow as pa

from pyspark.sql import SparkSession, functions as F

from .blocks import arrow_blocks_schema
from .encode import encode_batch
from .selector import BALANCED
from .tableio import TableIO

DEFAULT_BATCH_ROWS = 32768


def _local_path(uri: str) -> str:
    if uri.startswith("file:"):
        path = uri[5:]
        while path.startswith("//"):
            path = path[1:]
        return path
    return uri


def _fs_for(path_or_uri: str, filesystem=None):
    """(filesystem, path) for a path/URI: an explicit pyarrow filesystem
    wins (the path is used as-is within it — e.g. a SubTreeFileSystem
    with relative paths); otherwise scheme'd URIs resolve through
    pyarrow.fs.FileSystem.from_uri (s3://, hdfs://, gs://, file:), and
    bare paths map to the local filesystem. This is the seam that makes
    the direct paths storage-agnostic: every task-side open/write/rename
    below goes through the returned filesystem, never through os.*
    directly. pyarrow filesystems pickle, so they ride the task closure.

    Atomicity note: fs.move is an atomic rename on local/HDFS; object
    stores implement it as copy+delete, where the content-addressed
    deterministic target name keeps retries idempotent even without
    rename atomicity."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, path_or_uri
    if "://" in path_or_uri or path_or_uri.startswith("file:"):
        return pafs.FileSystem.from_uri(path_or_uri)
    return pafs.LocalFileSystem(), path_or_uri


def list_parquet_files(spark: SparkSession, input_path: str,
                       filesystem=None) -> List[str]:
    """Sorted parquet file list of a path (the unit of direct-encode
    partitioning; sorted => part ids are deterministic => resume-safe).
    With an explicit filesystem the listing runs through it too (paths
    stay fs-native, e.g. SubTreeFileSystem-relative), so no Spark-side
    path resolution is involved anywhere in the direct pipeline."""
    if filesystem is not None:
        from pyarrow import fs as pafs

        infos = filesystem.get_file_info(
            pafs.FileSelector(input_path, recursive=True))
        return sorted(
            i.path for i in infos
            if i.type == pafs.FileType.File
            and i.path.endswith(".parquet")
            and not i.base_name.startswith((".", "_")))
    return sorted(_local_path(f)
                  for f in spark.read.parquet(input_path).inputFiles())


def _snapshot_of_files(files: Sequence[str], files_per_task: int = 1) -> str:
    """Snapshot id of a direct-encode input: the sorted file listing AND
    the file->part grouping. files_per_task is part of the identity
    because part k's contents are a function of its file GROUP — resuming
    the same listing with a different grouping must not match old
    checkpoint rows (it would silently skip parts whose groups now hold
    different files). Callers passing an explicit snapshot_id take on the
    same obligation: keep files_per_task fixed across resumes.

    The marker is hashed only for NON-default groupings: the default
    files_per_task=1 id stays equal to the pre-grouping-aware id, so
    existing tables resume correctly across the upgrade (re-keying them
    would re-encode everything under a second snapshot and every row
    would decode twice)."""
    h = hashlib.sha256()
    if files_per_task != 1:
        h.update(f"g{files_per_task}".encode())
    for f in files:
        h.update(f.encode())
    return h.hexdigest()[:16]


def _path_block_coords(path: str):
    """(snapshot_id, part_id) parsed from a blocks file's hive path
    (.../snapshot_id=X/part_id=N/file.parquet)."""
    sid = pid = None
    for comp in path.split("/"):
        if comp.startswith("snapshot_id="):
            sid = comp[len("snapshot_id="):]
        elif comp.startswith("part_id="):
            pid = int(comp[len("part_id="):])
    return sid, pid


def _load_seq_masks(deletes_path: str, sid, pid, filesystem) -> dict:
    """{seq: OR'd MSB-first delete bitmap} for one (snapshot, part) — the
    in-task twin of deletes.aggregate_deletes, reading ONLY this
    coordinate's delete rows (the snapshot_id directory is pruned by the
    hive partitioning, part_id by a row filter over the tiny rows)."""
    import numpy as np
    import pyarrow.dataset as pads

    dfs, droot = _fs_for(deletes_path, filesystem)
    dset = pads.dataset(droot, format="parquet", partitioning="hive",
                        filesystem=dfs)
    t = dset.to_table(columns=["seq", "positions"],
                      filter=((pads.field("snapshot_id") == sid)
                              & (pads.field("part_id") == pid)))
    masks: dict = {}
    for s, b in zip(t.column("seq").to_pylist(),
                    t.column("positions").to_pylist()):
        a = np.frombuffer(b, np.uint8)
        cur = masks.get(s)
        if cur is None:
            masks[s] = a.copy()
        else:
            if len(a) > len(cur):
                cur, a = a.copy(), cur
                masks[s] = cur
            cur[:len(a)] |= a
    return {s: a.tobytes() for s, a in masks.items()}


def _append_del_masks(batch_iter, seq_masks: dict):
    """Append the _del_mask column make_decode_fn consumes (None for
    blocks this part's delete rows don't touch)."""
    from .decode import DELETE_MASK_COL

    for bb in batch_iter:
        seqs = bb.column(bb.schema.get_field_index("seq")).to_pylist()
        yield bb.append_column(
            pa.field(DELETE_MASK_COL, pa.binary()),
            pa.array([seq_masks.get(s) for s in seqs], pa.binary()))


def _task_attempt_token() -> str:
    """Attempt-unique token for temp file names: with speculative
    execution or a zombie attempt surviving a stage retry, two attempts
    of the same partition may run concurrently — a shared deterministic
    temp path would interleave their writes and os.replace could publish
    a corrupt file. Unique temp + deterministic target keeps the publish
    atomic: whichever attempt renames last wins with a COMPLETE file."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return str(ctx.taskAttemptId()) if ctx is not None else "local"


def _atomic_write_parquet(table: pa.Table, target: str,
                          filesystem=None) -> None:
    import posixpath

    import pyarrow.parquet as pq

    fs, path = _fs_for(target, filesystem)
    d, base = posixpath.split(path)
    fs.create_dir(d, recursive=True)
    # dot-prefixed temp name: Spark/pyarrow dataset readers IGNORE hidden
    # files, so a task that dies mid-write can never leave a half-written
    # file that a later scan would try to parse (a plain suffix would);
    # attempt-unique so concurrent attempts never share a temp path
    tmp = posixpath.join(
        d, "." + base + f".{_task_attempt_token()}.inprogress")
    # payloads are already entropy-coded: parquet re-compression is pure
    # waste (same rationale as TableIO.write_blocks).
    # row_group_size=1: ONE ROW GROUP PER BLOCK ROW, so per-row-group
    # parquet statistics carry each block's seq and a filtered decode
    # (decode_files_direct filters=) skips pruned blocks' payload BYTES
    # at the scan, not just their rows after materialization. Block rows
    # are MB-sized, so per-row-group overhead is noise.
    pq.write_table(table, tmp, filesystem=fs, compression="none",
                   row_group_size=1)
    fs.move(tmp, path)


def encode_files_direct(spark: SparkSession, input_path: str, io: TableIO,
                        snapshot_id: Optional[str] = None,
                        mode: str = BALANCED, plan="auto",
                        files_per_task: int = 1,
                        batch_rows: int = DEFAULT_BATCH_ROWS,
                        columns: Optional[List[str]] = None,
                        run_id: str = "direct",
                        only_parts: Optional[set] = None,
                        filesystem=None,
                        blocks_root: Optional[str] = None) -> dict:
    """Checkpointed direct encode: parquet files -> blocks table, with the
    scan, the codec work AND the blocks write all inside the task (zero
    table bytes over JVM<->Python IPC). One part = `files_per_task` input
    files; resume skips committed parts exactly like lineage.encode_job.

    filesystem: optional pyarrow filesystem for the task-side file IO
    (reads of the input parquet and writes of the blocks files); without
    it, paths resolve through pyarrow.fs.FileSystem.from_uri — s3/hdfs/
    gcs URIs work unchanged (see _fs_for).

    Timestamp interop note: Spark's DEFAULT parquet output writes
    timestamps as unannotated INT96, which pyarrow (and this scan-in-UDF
    path with it) reads as NAIVE timestamps — the encoded column then
    carries wall-clock NTZ semantics instead of instants, and session-tz
    string predicates compare differently than on a Spark-scanned table.
    Write inputs with spark.sql.parquet.outputTimestampType=
    TIMESTAMP_MICROS (annotated, adjusted-to-UTC) and the direct path
    preserves instant semantics end-to-end.

    blocks_root: optional fs-NATIVE path of the blocks directory for the
    task-side writes, when it differs from io.blocks_path (object
    stores: Spark reads "s3://bucket/t/blocks" while the pyarrow S3
    filesystem wants "bucket/t/blocks"; a SubTreeFileSystem wants a
    subtree-relative path). The checkpoint still goes through io (Spark
    paths) either way; default is io.blocks_path.

    Returns {"snapshot_id", "parts_done_before", "parts_encoded",
    "n_blocks", "n_rows", "bytes_in", "bytes_out"}.
    """
    files = list_parquet_files(spark, input_path, filesystem)
    if columns is None:
        if filesystem is not None:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(filesystem.open_input_file(files[0]))
            col_names = list(pf.schema_arrow.names)
            pf.close()
        else:
            first_schema = spark.read.parquet(input_path).schema
            col_names = [f.name for f in first_schema.fields]
    else:
        col_names = list(columns)
    snap = snapshot_id or _snapshot_of_files(files, files_per_task)
    if plan == "auto":
        if filesystem is not None:
            # driver-side bounded sample through the filesystem (Spark
            # cannot scan fs-native relative paths): head slices of up
            # to 8 evenly-strided files, same planner as build_plan
            import pyarrow.parquet as pq

            from .plan import plan_from_sample

            step = max(1, len(files) // 8)
            parts = []
            for f in files[::step][:8]:
                pf = pq.ParquetFile(filesystem.open_input_file(f))
                for b in pf.iter_batches(batch_size=2048, columns=columns):
                    parts.append(b)
                    break
                pf.close()
            # all sampled files empty: no plan (per-batch selector runs
            # standalone) — from_batches([]) without a schema would raise
            plan = (plan_from_sample(pa.Table.from_batches(parts),
                                     mode=mode)
                    if parts else None)
        else:
            from .plan import build_plan

            df = spark.read.parquet(input_path)
            if columns is not None:
                df = df.select(*columns)
            plan = build_plan(df, mode=mode)
    groups = [files[i:i + files_per_task]
              for i in range(0, len(files), files_per_task)]
    done = io.committed_parts(snap)
    pending = [(pid, grp) for pid, grp in enumerate(groups)
               if pid not in done
               and (only_parts is None or pid in only_parts)]
    result = {"snapshot_id": snap, "parts_done_before": len(done),
              "parts_encoded": 0, "n_blocks": 0, "n_rows": 0,
              "bytes_in": 0, "bytes_out": 0}
    if not pending:
        return result
    if blocks_root is None:
        blocks_root = io.blocks_path
    file_schema = pa.schema(
        [f for f in arrow_blocks_schema(col_names)
         if f.name not in ("snapshot_id", "part_id")])
    meta_schema = pa.schema([
        pa.field("part_id", pa.int32()), pa.field("n_blocks", pa.int64()),
        pa.field("n_rows", pa.int64()), pa.field("bytes_in", pa.int64()),
        pa.field("bytes_out", pa.int64()), pa.field("task_sec", pa.float64())])

    def work(batches):
        import time as _time

        import pyarrow.parquet as pq

        for b in batches:
            for row in b.to_pylist():
                _t0 = _time.time()
                pid, paths = int(row["part_id"]), row["paths"]
                out_batches = []
                n_rows = bytes_in = bytes_out = 0
                seq = 0
                for path in paths:
                    rfs, rpath = _fs_for(path, filesystem)
                    pf = pq.ParquetFile(rfs.open_input_file(rpath))
                    for batch in pf.iter_batches(batch_size=batch_rows,
                                                 columns=columns):
                        if batch.num_rows == 0:
                            continue
                        enc = encode_batch(batch, snap, pid, seq, mode,
                                           plan=plan)
                        seq += 1
                        n_rows += batch.num_rows
                        meta = enc.column("columns")[0].as_py()
                        bytes_in += sum(c["bytes_in"] for c in meta)
                        bytes_out += sum(c["bytes_out"] for c in meta)
                        out_batches.append(
                            enc.select([f.name for f in file_schema]))
                    pf.close()
                target = os.path.join(
                    blocks_root, f"snapshot_id={snap}", f"part_id={pid}",
                    f"direct-{snap}-{pid}.parquet")
                _atomic_write_parquet(
                    pa.Table.from_batches(out_batches, schema=file_schema),
                    target, filesystem=filesystem)
                yield pa.RecordBatch.from_pylist([{
                    "part_id": pid, "n_blocks": seq, "n_rows": n_rows,
                    "bytes_in": bytes_in, "bytes_out": bytes_out,
                    "task_sec": _time.time() - _t0,
                }], schema=meta_schema)

    rows = [(pid, grp) for pid, grp in pending]
    # round-robin repartition: exactly-even one-row-per-task placement
    # (hashing part_id would collide ~37% of groups onto shared tasks)
    fdf = (spark.createDataFrame(rows, "part_id int, paths array<string>")
           .repartition(len(rows)))
    meta = fdf.mapInArrow(
        work, "part_id int, n_blocks long, n_rows long, bytes_in long, "
              "bytes_out long, task_sec double").collect()
    cp = spark.createDataFrame(
        [(snap, r["part_id"], r["n_blocks"], r["n_rows"], r["bytes_in"],
          r["bytes_out"], run_id, "committed") for r in meta],
        "snapshot_id string, part_id int, n_blocks long, n_rows long, "
        "bytes_in long, bytes_out long, run_id string, status string")
    io.append_checkpoint(cp)
    for r in meta:
        result["parts_encoded"] += 1
        result["n_blocks"] += r["n_blocks"]
        result["n_rows"] += r["n_rows"]
        result["bytes_in"] += r["bytes_in"]
        result["bytes_out"] += r["bytes_out"]
    return result


def decode_files_direct(spark: SparkSession, io: TableIO, output_path: str,
                        columns: Optional[List[str]] = None,
                        verify: bool = False,
                        files_per_task: int = 1,
                        filesystem=None,
                        filters=None,
                        blocks_root: Optional[str] = None,
                        schema=None,
                        deletes_path: Optional[str] = None,
                        snapshots: Optional[Sequence[str]] = None) -> dict:
    """Direct decode-to-parquet: each task reads its blocks files with
    pyarrow, decodes (reusing the engine's make_decode_fn — including
    verify's canonical-sha256 recomputation), and writes its output
    parquet file itself. The decoded table bytes never cross JVM<->Python
    IPC nor the JVM parquet writer — the counterpart of the measured
    decode floor, where shipping decoded rows back for a count was most
    of the wall. Output files are one per task (part-<id>.parquet),
    overwritten idempotently on retry.

    filters: same predicate language as decode_blocks(filters=)
    (= == != < <= > >= between / IN lists / OR-of-conjunction groups),
    evaluated ENTIRELY inside the task: a cheap metadata-only pass over
    each file (payload columns never read) runs the zone-map / bloom /
    string-prefix block pruning in Python (decode.block_keep_py), the
    payload read is then restricted to the surviving blocks' row groups
    via a pyarrow `seq IN (...)` dataset filter (the direct writers emit
    one row group per block, so pruned blocks' payload bytes stay on
    disk), and the exact row predicate applies to the decoded batches
    before the write. The two flagship 100 TB features — zero-IPC decode
    and automatic pruning — compose.

    schema: optional Spark StructType for SCHEMA-EVOLVED tables (snapshots
    with different column sets). Every task then decodes compat against
    this target — older generations' missing columns null-filled, unknown
    columns ignored — so the output directory is ONE uniform parquet
    schema. Without it, each task writes its generation's own columns and
    a consumer reading the directory without footer merging silently
    drops the newer columns. Infer the union with
    decode.union_schema_of_blocks (or pass the current table schema).

    deletes_path: the table's merge-on-read position-delete file set
    (engine/deletes.py; usually io.deletes_path when io.has_deletes()).
    Each task derives its blocks files' (snapshot_id, part_id) from the
    hive path, reads ONLY those coordinates' delete rows (snapshot_id is
    the deletes partition key, so the pyarrow scan prunes directories),
    ORs the bitmaps per block and masks deleted rows out after decode —
    the in-task twin of decode_blocks(deletes=), zero IPC preserved."""
    from .decode import (block_keep_py, exact_filter_mask_py,
                         make_decode_fn, _normalize_filters)

    compat_target = None
    if schema is not None:
        from pyspark.sql.pandas.types import to_arrow_type

        compat_target = pa.schema([pa.field(f.name,
                                            to_arrow_type(f.dataType))
                                   for f in schema.fields])

    if filesystem is not None and blocks_root is not None:
        files = list_parquet_files(spark, blocks_root, filesystem)
    else:
        files = sorted(_local_path(f)
                       for f in io.read_blocks().inputFiles())
    if snapshots is not None:
        # snapshot-scoped read: snapshot_id is the first hive partition
        # key, so this prunes whole directories before any task launches
        want = {str(s) for s in snapshots}
        files = [f for f in files if _path_block_coords(f)[0] in want]
    session_tz = None
    if filters:
        # validate + normalize ONCE on the driver: the task loop calls
        # block_keep_py per block, and re-normalizing (plus re-parsing
        # leaf values) 10^5 times per part would be pure waste — the
        # canonicalization itself is also lru-cached (decode.py)
        filters = _normalize_filters(filters)
        try:
            session_tz = spark.conf.get("spark.sql.session.timeZone")
        except Exception:
            session_tz = None
        if columns is not None:
            from .decode import filter_root_columns_of

            # one first-block metadata probe so dotted struct-child
            # leaves resolve to their ROOT decode column
            types = {}
            if files:
                import pyarrow.parquet as _pq

                f0fs, f0 = _fs_for(files[0], filesystem)
                t0 = _pq.ParquetFile(f0fs.open_input_file(f0)).read(
                    columns=["columns"]).column("columns")
                if len(t0):
                    types = {c["name"]: c["arrow_type"]
                             for c in t0[0].as_py()}
            missing = [c for c in filter_root_columns_of(filters, types)
                       if c not in columns]
            # filter columns must decode; keep them in the output too
            # (the direct path writes files, dropping them afterwards
            # would mean a second pass — document instead)
            columns = list(columns) + missing
        if compat_target is not None:
            from .decode import filter_root_columns_of as _froots

            names = {f.name for f in compat_target}
            bad = [c for c in _froots(filters, dict.fromkeys(names))
                   if c not in names]
            if bad:
                raise ValueError(
                    f"compat decode with filters: filter columns {bad} "
                    f"must be part of the provided schema")
    # scan projection source: explicit columns, else the compat target's
    # fields (other generations' payload bytes then stay on disk)
    scan_want = columns
    if scan_want is None and compat_target is not None:
        scan_want = [f.name for f in compat_target]
    groups = [files[i:i + files_per_task]
              for i in range(0, len(files), files_per_task)]
    meta_schema = pa.schema([pa.field("part_id", pa.int32()),
                             pa.field("n_rows", pa.int64()),
                             pa.field("n_blocks_read", pa.int64()),
                             pa.field("n_blocks_total", pa.int64())])
    out_fs, out_root = _fs_for(output_path, filesystem)
    out_fs.create_dir(out_root, recursive=True)
    # sweep STALE parts up front: tasks below overwrite/delete only the
    # part ids of THIS run, so a prior decode into the same directory
    # with more parts (larger files_per_task, a since-shrunk blocks
    # listing) would leave its higher-numbered part files mixing stale
    # or unfiltered rows into the result
    import posixpath
    from pyarrow import fs as pafs

    valid = {f"part-{pid:05d}.parquet" for pid in range(len(groups))}
    sel = pafs.FileSelector(out_root, allow_not_found=True)
    for info in out_fs.get_file_info(sel):
        base = posixpath.basename(info.path)
        if (base.startswith("part-") and base.endswith(".parquet")
                and base not in valid):
            out_fs.delete_file(info.path)

    def work(batches):
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        from .blocks import payload_field, validity_field

        fn = make_decode_fn(verify=verify, columns=columns,
                            target=compat_target)
        del_cache: dict = {}  # (snapshot_id, part_id) -> {seq: bitmap}
        for b in batches:
            for row in b.to_pylist():
                pid, paths = int(row["part_id"]), row["paths"]
                out_batches = []
                n = 0
                blocks_read = blocks_total = 0
                for path in paths:
                    rfs, rpath = _fs_for(path, filesystem)
                    pf = pq.ParquetFile(rfs.open_input_file(rpath))
                    seq_masks = None
                    if deletes_path is not None:
                        coords = _path_block_coords(path)
                        if coords not in del_cache:
                            del_cache[coords] = _load_seq_masks(
                                deletes_path, *coords,
                                filesystem=filesystem)
                        seq_masks = del_cache[coords] or None
                    have = set(pf.schema_arrow.names)
                    read_cols = None
                    if scan_want is not None:
                        # projection reaches the pyarrow scan: unrequested
                        # columns' payload bytes are never read from disk
                        read_cols = (
                            [c for c in ("block_id", "seq", "n_rows",
                                         "columns") if c in have]
                            + [f for c in scan_want
                               for f in (payload_field(c),
                                         validity_field(c)) if f in have])
                    if filters:
                        # metadata-only pruning pass: columns/seq leaves
                        # only, zero payload bytes
                        meta = pf.read(columns=["seq", "n_rows",
                                                "columns"])
                        seqs = meta.column("seq").to_pylist()
                        nrows = meta.column("n_rows").to_pylist()
                        metas = meta.column("columns").to_pylist()
                        blocks_total += len(seqs)
                        keep = [s for s, nr, m in zip(seqs, nrows, metas)
                                if block_keep_py(m, filters,
                                                 session_tz=session_tz,
                                                 n_rows=nr)]
                        blocks_read += len(keep)
                        pf.close()
                        if not keep:
                            continue
                        # surviving blocks only: one row group per block
                        # (direct writers), so the seq filter prunes at
                        # row-group granularity via parquet statistics
                        dset = pads.dataset(rpath, format="parquet",
                                            filesystem=rfs)
                        it = dset.to_batches(
                            columns=read_cols,
                            filter=pads.field("seq").isin(keep))
                        if seq_masks:
                            it = _append_del_masks(it, seq_masks)
                        for out in fn(it):
                            mask = exact_filter_mask_py(out, filters,
                                                        session_tz)
                            out = out.filter(mask)
                            if out.num_rows:
                                out_batches.append(out)
                                n += out.num_rows
                        continue
                    blocks_total += pf.metadata.num_rows
                    blocks_read += pf.metadata.num_rows
                    it = pf.iter_batches(columns=read_cols)
                    if seq_masks:
                        it = _append_del_masks(it, seq_masks)
                    for out in fn(it):
                        out_batches.append(out)
                        n += out.num_rows
                    pf.close()
                wfs, wroot = _fs_for(output_path, filesystem)
                target = f"{wroot}/part-{pid:05d}.parquet"
                if out_batches:
                    import pyarrow.parquet as _pq

                    tmp = (f"{wroot}/.part-{pid:05d}.parquet"
                           f".{_task_attempt_token()}.inprogress")
                    _pq.write_table(
                        pa.Table.from_batches(out_batches), tmp,
                        filesystem=wfs, compression="snappy")
                    wfs.move(tmp, target)
                else:
                    # this part produced no rows (e.g. filters pruned
                    # everything): a part file from a PRIOR run into the
                    # same directory would otherwise survive and mix
                    # unfiltered rows into the result
                    try:
                        wfs.delete_file(target)
                    except (FileNotFoundError, OSError):
                        pass
                yield pa.RecordBatch.from_pylist(
                    [{"part_id": pid, "n_rows": n,
                      "n_blocks_read": blocks_read,
                      "n_blocks_total": blocks_total}], schema=meta_schema)

    rows = list(enumerate(groups))
    fdf = (spark.createDataFrame(rows, "part_id int, paths array<string>")
           .repartition(len(rows)))
    meta = fdf.mapInArrow(
        work, "part_id int, n_rows long, n_blocks_read long, "
              "n_blocks_total long").collect()
    return {"n_rows": sum(r["n_rows"] for r in meta),
            "n_parts": len(meta),
            "n_blocks_read": sum(r["n_blocks_read"] for r in meta),
            "n_blocks_total": sum(r["n_blocks_total"] for r in meta)}


def encode_table_direct_write(df, io: TableIO, key: Optional[str] = None,
                              partitions: Optional[int] = None,
                              sort_within: bool = False,
                              snapshot_id: str = "", mode: str = BALANCED,
                              plan=None, overrides=None, cluster_by=None,
                              cluster_layout: str = "range",
                              skip_parts=None,
                              sketches: Optional[bool] = None,
                              filesystem=None):
    """HYBRID encode: the Spark plan still owns the layout (salted-hash
    shuffle / deterministic range clustering — row transport that a
    scan-in-UDF path cannot do), but each task WRITES its partition's
    blocks file itself and returns only metadata rows. Compared to
    encode_table + io.write_blocks this removes the IPC-out leg (the
    encoded payloads never travel back to the JVM) and the JVM parquet
    writer — roughly half the remaining serialization of the
    write-inclusive encode job (see BENCH/BASELINE.md "IPC floor").

    Exactly-once matches TableIO's dynamic partition overwrite: the
    output file name is a pure function of (snapshot_id, partitionId),
    the write is temp+atomic-rename, and any stale files of the same
    partition directory (artifacts of a crashed, never-checkpointed
    attempt) are removed before the rename.

    Returns a driver-small metadata DataFrame
    (part_id, n_blocks, n_rows, bytes_in, bytes_out); call .collect()
    (or aggregate) to run the job. The blocks land in io.blocks_path and
    read back through io.read_blocks() like any other snapshot.
    """
    import pyarrow.parquet  # noqa: F401  (fail fast on driver if missing)

    from pyspark import TaskContext

    from .encode import layout_for_encode, make_encode_fn
    from .selector import FAST

    if sketches is None:
        sketches = mode != FAST
    df = layout_for_encode(df, key=key, partitions=partitions,
                           sort_within=sort_within, cluster_by=cluster_by,
                           cluster_layout=cluster_layout)
    col_names = [f.name for f in df.schema.fields]
    file_schema = pa.schema(
        [f for f in arrow_blocks_schema(col_names)
         if f.name not in ("snapshot_id", "part_id")])
    file_names = [f.name for f in file_schema]
    blocks_root = io.blocks_path
    snap = snapshot_id
    inner = make_encode_fn(snap, mode, skip_parts, plan, overrides, sketches)

    def work(batches):
        import posixpath

        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = str(ctx.taskAttemptId()) if ctx is not None else "local"
        bfs, broot = _fs_for(blocks_root, filesystem)
        part_dir = posixpath.join(broot, f"snapshot_id={snap}",
                                  f"part_id={pid}")
        target = posixpath.join(part_dir, f"direct-{snap}-{pid}.parquet")
        # attempt-unique temp: a zombie attempt surviving a stage retry
        # must never interleave writes into a live attempt's temp file;
        # the deterministic TARGET keeps the publish idempotent
        tmp = posixpath.join(part_dir,
                             f".direct-{snap}-{pid}.{attempt}.inprogress")
        writer = None
        n_blocks = n_rows = bytes_in = bytes_out = 0
        for enc in inner(batches):
            if writer is None:
                bfs.create_dir(part_dir, recursive=True)
                writer = pq.ParquetWriter(tmp, file_schema, filesystem=bfs,
                                          compression="none")
            writer.write_table(
                pa.Table.from_batches([enc.select(file_names)]))
            n_blocks += 1
            n_rows += enc.column("n_rows")[0].as_py()
            meta = enc.column("columns")[0].as_py()
            bytes_in += sum(c["bytes_in"] for c in meta)
            bytes_out += sum(c["bytes_out"] for c in meta)
        if writer is not None:
            writer.close()
            # dynamic-overwrite semantics: clear stale files of THIS
            # partition (only a crashed, never-checkpointed attempt can
            # have left any), then publish atomically
            sel = pafs.FileSelector(part_dir, allow_not_found=True)
            for info in bfs.get_file_info(sel):
                base = posixpath.basename(info.path)
                if base != posixpath.basename(tmp) \
                        and not base.startswith("."):
                    bfs.delete_file(info.path)
            bfs.move(tmp, target)
            yield pa.RecordBatch.from_pylist([{
                "part_id": pid, "n_blocks": n_blocks, "n_rows": n_rows,
                "bytes_in": bytes_in, "bytes_out": bytes_out,
            }], schema=pa.schema([
                pa.field("part_id", pa.int32()),
                pa.field("n_blocks", pa.int64()),
                pa.field("n_rows", pa.int64()),
                pa.field("bytes_in", pa.int64()),
                pa.field("bytes_out", pa.int64())]))

    return df.mapInArrow(
        work, "part_id int, n_blocks long, n_rows long, bytes_in long, "
              "bytes_out long")


def encode_job_direct_write(spark, input_df, io: TableIO,
                            key: Optional[str] = "url",
                            snapshot_id: Optional[str] = None,
                            mode: str = BALANCED,
                            partitions: Optional[int] = None,
                            sort_within: bool = True,
                            run_id: str = "r0", plan="auto",
                            overrides=None, cluster_by=None,
                            cluster_layout: str = "range",
                            filesystem=None) -> dict:
    """Checkpointed HYBRID encode job — the production recipe with the
    IPC-out leg removed: Spark owns the layout (salted url-hash shuffle
    or deterministic range clustering, the row transport a scan-in-UDF
    path cannot do), each task writes its partition's blocks file itself
    (encode_table_direct_write), and the exactly-once protocol is
    lineage.encode_job's verbatim: snapshot-keyed checkpoint skip-set
    evaluated inside the encode UDF, content-addressed blocks,
    attempt-unique temps + deterministic targets, dynamic-overwrite
    cleanup. Returns the same result dict as encode_files_direct.
    """
    from .tableio import snapshot_of_input

    snap = snapshot_id or snapshot_of_input(input_df)
    if cluster_by is not None and snapshot_id is None:
        # same identity rule as lineage.encode_job: the cluster layout
        # (columns + version) is part of the snapshot — see
        # encode.clustered_snapshot_id
        from .encode import clustered_snapshot_id

        snap = clustered_snapshot_id(snap, cluster_by, cluster_layout)
    if plan == "auto":
        from .plan import build_plan

        plan = build_plan(input_df, mode=mode)
    done = io.committed_parts(snap)
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    meta = encode_table_direct_write(
        input_df, io, key=None if cluster_by else key, partitions=p,
        sort_within=sort_within, snapshot_id=snap, mode=mode, plan=plan,
        overrides=overrides, cluster_by=cluster_by,
        cluster_layout=cluster_layout,
        skip_parts=set(done), filesystem=filesystem).collect()
    result = {"snapshot_id": snap, "parts_done_before": len(done),
              "parts_encoded": len(meta),
              "n_blocks": sum(r["n_blocks"] for r in meta),
              "n_rows": sum(r["n_rows"] for r in meta),
              "bytes_in": sum(r["bytes_in"] for r in meta),
              "bytes_out": sum(r["bytes_out"] for r in meta)}
    if meta:
        cp = spark.createDataFrame(
            [(snap, int(r["part_id"]), int(r["n_blocks"]),
              int(r["n_rows"]), int(r["bytes_in"]), int(r["bytes_out"]),
              run_id, "committed") for r in meta],
            "snapshot_id string, part_id int, n_blocks long, n_rows long, "
            "bytes_in long, bytes_out long, run_id string, status string")
        io.append_checkpoint(cp)
    return result
