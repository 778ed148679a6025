"""Job-level codec plan: the "single Spark pass" statistics/selection step
from the north star.

build_plan() samples the input ACROSS partitions (a bounded per-partition
head take via mapInArrow, collected small to the driver), runs the full
per-column selector on the sample, and captures anything expensive to
rebuild per batch — today that is the FSST symbol table. The plan is a tiny
plain-dict object that rides into the encode UDF closure (an implicit
broadcast), so per-batch work drops to: encode the planned codec + the
cheap always-on safety candidates, and never rebuild symbol tables.

Why not `df.limit(n)`: limit pulls from the first partition(s) only, so a
sorted or per-host-clustered input would mis-plan the FSST/dict decision
for the whole job. The per-partition take spreads the sample over up to
_SAMPLE_PARTS evenly-strided partitions, which is unbiased w.r.t. any
partition-level clustering and costs one cheap narrow job (each sampled
task reads only its first Arrow batches; at cluster scale the non-sampled
tasks are no-ops).

Size-parity note: the plan never *removes* the cheap reference-format
candidates from the per-batch race (selector.select_encode always encodes
split/plain/rle-family), so a batch that defeats the planned codec still
falls back to something <= the reference's own best size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..codecs import fsst as fsst_mod
from ..codecs import get_codec
from ..codecs.core import BIN, STR, domain_of, str_buffers
from ..codecs.nputil import CodecError
from .selector import BALANCED, FAST, SIZE, select_encode

DEFAULT_SAMPLE_ROWS = 8_192
_SAMPLE_PARTS = 64          # spread the sample over at most this many parts
# job-level FSST tables are built ONCE, so afford a bigger sample and more
# merge rounds than the per-batch defaults (measured ~1.3% better ratio
# than rounds=5/128K); per-column planning runs in a small thread pool
# (numpy releases the GIL) to keep the plan pass under ~1s of driver CPU
_JOB_FSST_SAMPLE = 256 << 10
_JOB_FSST_ROUNDS = 8


@dataclass
class ColumnPlan:
    codec: str
    fsst_symbols: Optional[List[bytes]] = None
    sample_ratio: float = 1.0  # sampled bytes_out / bytes_in


@dataclass
class CodecPlan:
    columns: Dict[str, ColumnPlan] = field(default_factory=dict)
    mode: str = BALANCED

    def get(self, name: str) -> Optional[ColumnPlan]:
        return self.columns.get(name)


def _raw_bytes(arr: pa.Array) -> int:
    return sum(b.size for b in arr.buffers() if b is not None)


_PRICE_BYTES = 1 << 20  # price candidates on a bounded slice of the sample


def _plan_str_column(arr: pa.Array, mode: str) -> ColumnPlan:
    """Price every string-domain candidate on the sample, building the
    job-level FSST symbol table exactly once (the per-batch select_encode
    path would build a throwaway table first and the job table second).

    All candidates are priced on the SAME bounded slice (~1 MB) — enough
    for a stable ratio estimate; the per-batch race still guarantees the
    <=-reference size regardless of what the plan picks."""
    full_data, full_offsets = str_buffers(arr)
    if len(full_data) > _PRICE_BYTES:
        cut = max(1, int(np.searchsorted(full_offsets, _PRICE_BYTES)))
        arr = arr.slice(0, min(cut, len(arr)))
    # logical size of the (possibly sliced) pricing window: buffers() on a
    # slice returns the full parent buffers, which would understate the
    # recorded ratio for columns larger than _PRICE_BYTES
    data, offsets = str_buffers(arr)
    raw = len(data) + offsets.nbytes
    sizes: Dict[str, int] = {"split": len(get_codec("split").encode(arr))}
    if len(arr) > 1:
        from ..codecs.rle_family import rle_size_binary
        sizes["rle"] = rle_size_binary(arr)
    try:
        sizes["dict"] = len(get_codec("dict").encode(arr))
    except (CodecError, OverflowError):
        pass
    symbols: Optional[List[bytes]] = None
    if mode != FAST:
        symbols = fsst_mod.build_table(
            data, offsets, rounds=_JOB_FSST_ROUNDS,
            sample_bytes=_JOB_FSST_SAMPLE)
        if symbols:
            sizes["fsst"] = len(fsst_mod.fsst_encode(
                data, offsets, symbols=symbols))
    best = min(sizes.items(), key=lambda kv: (kv[1], kv[0]))[0]
    cp = ColumnPlan(codec=best,
                    sample_ratio=sizes[best] / max(1, raw))
    if best == "fsst":
        cp.fsst_symbols = symbols
    return cp


def _plan_one(arr: pa.Array, mode: str) -> Optional[ColumnPlan]:
    try:
        dom = domain_of(arr.type)
    except CodecError:
        return None
    if dom in (STR, BIN):
        return _plan_str_column(arr, mode)
    choice = select_encode(arr, mode=SIZE if mode != FAST else mode)
    raw = max(1, _raw_bytes(arr))
    return ColumnPlan(codec=choice.codec,
                      sample_ratio=len(choice.payload) / raw)


def plan_from_sample(sample: pa.Table, mode: str = BALANCED) -> CodecPlan:
    from concurrent.futures import ThreadPoolExecutor

    plan = CodecPlan(mode=mode)
    work = []
    for i, fld in enumerate(sample.schema):
        arr = sample.column(i).combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        if len(arr) == 0:
            continue
        work.append((fld.name, arr))
    if not work:
        return plan
    # longest columns first: the pool drains big items while small ones fill
    work.sort(key=lambda w: -_raw_bytes(w[1]))
    with ThreadPoolExecutor(max_workers=min(4, len(work))) as pool:
        results = list(pool.map(lambda w: _plan_one(w[1], mode), work))
    for (name, _), cp in zip(work, results):
        if cp is not None:
            plan.columns[name] = cp
    return plan


def sample_table(df, sample_rows: int = DEFAULT_SAMPLE_ROWS) -> pa.Table:
    """Cross-partition sample: up to _SAMPLE_PARTS evenly-strided
    partitions each contribute a bounded head slice, collected small."""
    from pyspark import TaskContext

    nparts = 0
    try:
        # cheap metadata probe first (a .rdd conversion can cost ~0.5s of
        # JVM work on wide plans); file count ~ partition count for scans
        nparts = len(df.inputFiles())
    except Exception:
        pass
    if nparts <= 0:  # non-file-backed DF: ask the RDD
        try:
            nparts = max(1, df.rdd.getNumPartitions())
        except Exception:
            nparts = _SAMPLE_PARTS
    want = min(nparts, _SAMPLE_PARTS)
    step = max(1, nparts // want)
    per_part = max(64, sample_rows // want)

    def take_head(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        if pid % step:
            return
        taken = 0
        for batch in batches:
            if taken >= per_part:
                break
            take = min(batch.num_rows, per_part - taken)
            if take > 0:
                yield batch.slice(0, take)
            taken += take

    sample = df.mapInArrow(take_head, df.schema).toArrow()
    if sample.num_rows == 0:  # e.g. all sampled partitions empty
        sample = df.limit(sample_rows).toArrow()
    return sample


def build_plan(df, mode: str = BALANCED,
               sample_rows: int = DEFAULT_SAMPLE_ROWS) -> CodecPlan:
    """Cross-partition sample (one narrow Spark job) -> codec plan."""
    return plan_from_sample(sample_table(df, sample_rows), mode=mode)
