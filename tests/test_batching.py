"""BatchFlusher: bounded Arrow output batches for payload exploders."""

import pandas as pd

from cloud_optimized_data_pipelines_spark.batching import BatchFlusher


def test_flush_on_bytes():
    fl = BatchFlusher(["id", "blob"], budget=100, max_rows=1000)
    outs = []
    for i in range(10):
        out = fl.add({"id": i, "blob": "x" * 40}, nbytes=40)
        if out is not None:
            outs.append(out)
    tail = fl.tail()
    if tail is not None:
        outs.append(tail)
    # 40 bytes/row, 100-byte budget -> flush every 3 rows
    assert [len(o) for o in outs] == [3, 3, 3, 1]
    assert pd.concat(outs)["id"].tolist() == list(range(10))
    assert fl.tail() is None  # drained


def test_flush_on_rows():
    fl = BatchFlusher(["id"], budget=1 << 30, max_rows=4)
    outs = [o for i in range(9) if (o := fl.add({"id": i})) is not None]
    tail = fl.tail()
    assert [len(o) for o in outs] == [4, 4]
    assert len(tail) == 1
    assert list(tail.columns) == ["id"]


def test_empty_tail():
    fl = BatchFlusher(["id"])
    assert fl.tail() is None
