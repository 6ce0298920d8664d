"""The registry module layout (queries.py -> registry/q_*.py) must not
change registration semantics.  Invariants are ROTATION-PROOF: the
source-derived registration order (module import order x in-file
@query order) is the ground truth; the runtime dict must equal the
graded window followed by the remaining source order; and the
snapshot must stay an order-preserved subsequence (rounds APPEND
queries, they never reshuffle).  The snapshot was re-baselined in r12
when the round-named q_r11_additions module was folded verbatim into
its family modules (VERDICT r11 task 9), again in r13 when the
4,121-line q_multimodal was split verbatim into image/audio/video
family modules (VERDICT r12 task 4), and again in r14 when the
3,049-line q_survey_misc grab-bag was split verbatim into five theme
modules (VERDICT r13 task 5) — deliberate one-time source-order
changes; the graded window (what the driver grades) is order-pinned
independently by _GRADED_WINDOW."""

import json
import re
from pathlib import Path

from cloud_optimized_data_pipelines_spark.queries import (
    _GRADED_WINDOW,
    ORACLE,
    QUERIES,
)

_SNAP = json.loads(
    (Path(__file__).parent / "data_registry_order_r14.json").read_text()
)
_REG_DIR = (
    Path(__file__).parent.parent
    / "cloud_optimized_data_pipelines_spark"
    / "registry"
)


def _source_order() -> list[str]:
    names: list[str] = []
    for m in _SNAP["modules"]:
        src = (_REG_DIR / f"{m}.py").read_text()
        names += re.findall(r'^@query\("([a-z0-9_]+)"', src, re.M)
    return names


def test_runtime_dict_is_window_plus_source_order():
    src = _source_order()
    assert set(src) == set(QUERIES)
    want = _GRADED_WINDOW + [n for n in src if n not in set(_GRADED_WINDOW)]
    assert list(QUERIES) == want


def test_split_snapshot_is_an_order_preserved_subsequence():
    src = _source_order()
    snap = _SNAP["source_order"]
    assert [n for n in src if n in set(snap)] == snap
    assert set(snap) <= set(src)


def test_graded_window_is_the_first_50():
    names = list(QUERIES)
    assert names[: len(_GRADED_WINDOW)] == _GRADED_WINDOW
    assert len(_GRADED_WINDOW) == 50
    assert all(n in ORACLE for n in _GRADED_WINDOW)


def test_registry_modules_define_no_duplicate_queries():
    src = _source_order()
    assert len(src) == len(set(src)) == len(QUERIES)
