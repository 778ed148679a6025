"""Size parity vs the reference byte-model oracle across the driver's
own tables (documents / events / lineitem at sf0.001): for every column,
the selector's payload must be <= the best size the reference could
achieve with its strategy set on the same batch."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkolumnar import refmodel as rm
from sparkolumnar.engine.selector import select_encode

SF = "/root/testdata/sf0.001"

CASES = [
    ("documents", "text", "str"),
    ("documents", "lang", "str"),
    ("documents", "source", "str"),
    ("documents", "doc_id", "int"),
    ("documents", "n_chars", "int"),
    ("events", "event_id", "int"),
    ("events", "user_id", "int"),
    ("events", "event_type", "str"),
    ("events", "value", "f64"),
    ("lineitem", "l_orderkey", "int"),
    ("lineitem", "l_partkey", "int"),
    ("lineitem", "l_linenumber", "int"),
    ("lineitem", "l_returnflag", "str"),
    ("lineitem", "l_linestatus", "str"),
    ("lineitem", "l_quantity", "f64"),
]


@pytest.mark.parametrize("table,col,kind", CASES)
def test_column_size_parity(table, col, kind):
    arr = pq.read_table(f"{SF}/{table}.parquet", columns=[col]).column(col)
    arr = arr.combine_chunks()
    if arr.type == pa.int32():
        arr = arr.cast(pa.int64())
    choice = select_encode(arr)
    ref = rm.reference_column_size(arr.to_pylist(), kind)
    assert len(choice.payload) <= ref, (
        f"{table}.{col}: ours={len(choice.payload)} ({choice.codec}) "
        f"ref={ref} tried={choice.tried}")


def test_timestamp_parity():
    arr = (pq.read_table(f"{SF}/events.parquet", columns=["ts"])
           .column("ts").combine_chunks())
    choice = select_encode(arr)
    ref = rm.reference_column_size(arr.cast(pa.int64()).to_pylist(), "int")
    assert len(choice.payload) <= ref
