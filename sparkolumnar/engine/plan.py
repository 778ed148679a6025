"""Job-level codec plan: the "single Spark pass" statistics/selection step
from the north star.

build_plan() samples the input once (driver-side Arrow pull of a bounded
row count), runs the full per-column selector on the sample, and captures
anything expensive to rebuild per batch — today that is the FSST symbol
table. The plan is a tiny plain-dict object that rides into the encode UDF
closure (an implicit broadcast), so per-batch work drops to: encode the
planned codec + the cheap always-on safety candidates, and never rebuild
symbol tables.

Size-parity note: the plan never *removes* the cheap reference-format
candidates from the per-batch race (selector.select_encode always encodes
split/plain/rle-family), so a batch that defeats the planned codec still
falls back to something <= the reference's own best size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import pyarrow as pa

from ..codecs import fsst as fsst_mod
from ..codecs.core import str_buffers
from .selector import BALANCED, SIZE, select_encode

DEFAULT_SAMPLE_ROWS = 8_192


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


def plan_from_sample(sample: pa.Table, mode: str = BALANCED) -> CodecPlan:
    plan = CodecPlan(mode=mode)
    for i, fld in enumerate(sample.schema):
        arr = sample.column(i).combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        if len(arr) == 0:
            continue
        choice = select_encode(arr, mode=SIZE if mode != "fast" else mode)
        raw = max(1, _raw_bytes(arr))
        cp = ColumnPlan(codec=choice.codec,
                        sample_ratio=len(choice.payload) / raw)
        if choice.codec == "fsst":
            # one-time job-level build: afford a bigger sample + more
            # merge rounds (~5-6% better ratio than the per-batch default)
            data, offsets = str_buffers(arr)
            cp.fsst_symbols = fsst_mod.build_table(
                data, offsets, rounds=5, sample_bytes=128 << 10)
        plan.columns[fld.name] = cp
    return plan


def _raw_bytes(arr: pa.Array) -> int:
    return sum(b.size for b in arr.buffers() if b is not None)


def build_plan(df, mode: str = BALANCED,
               sample_rows: int = DEFAULT_SAMPLE_ROWS) -> CodecPlan:
    """Sample the DataFrame (bounded driver pull) and derive the plan."""
    sample = df.limit(sample_rows).toArrow()
    return plan_from_sample(sample, mode=mode)
