"""Item-id derivation and path helpers.

Replicates ``BaseEvent.item_id`` (``lambdas/build-stac/utils/events.py:22-29``,
SURVEY C4) and the path scalars (SURVEY C8).

Reference semantics: if ``id_regex`` is set, ``re.findall`` must yield
exactly one match whose capture groups are joined with ``-``; otherwise
``Path(s3_filename).stem`` (basename minus ONLY the last extension).

Intentional divergence (documented): with a single capture group the
reference joins the *characters* of the matched string
(``"-".join("abc") == "a-b-c"`` — a latent bug its tests never hit, both
test cases at test_regex.py:139-168 use two groups).  We join capture
groups, which matches the reference's observable tested behavior.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_basename(c: Column | str) -> Column:
    """Last path segment — ``filename.split('/')[-1]`` (data-transfer/handler.py:39)."""
    if isinstance(c, str):
        c = F.col(c)
    return F.element_at(F.split(c, "/"), -1)


def path_stem(c: Column | str) -> Column:
    """``pathlib.Path(x).stem``: basename minus the last suffix only.

    ``foo.nc.tif -> foo.nc``; ``.bashrc -> .bashrc``; ``foo -> foo``;
    ``foo. -> foo.`` (pathlib counts a suffix only when at least one
    character follows the dot — hence ``[^.]+``, not ``[^.]*``; caught
    by the hypothesis fuzz in tests/test_properties.py).
    """
    base = path_basename(c)
    stripped = F.regexp_extract(base, r"^(.+)\.[^.]+$", 1)
    return F.when(stripped != "", stripped).otherwise(base)


def capture_group_count(pattern: str) -> int:
    """Number of capture groups in a Python regex (compiled driver-side)."""
    return re.compile(pattern).groups


def item_id(s3_filename: Column | str, id_regex: str | None = None) -> Column:
    """STAC item id for a fixed (per-collection) ``id_regex``.

    The regex is a pipeline-config literal, so the group count is known
    driver-side and the whole expression stays JVM-side codegen —
    ``concat_ws('-', regexp_extract(g1), ..., regexp_extract(gN))``.
    For per-row regexes use :func:`item_id_per_row`.
    """
    if isinstance(s3_filename, str):
        s3_filename = F.col(s3_filename)
    if not id_regex:
        return path_stem(s3_filename)
    n = capture_group_count(id_regex)
    if n == 0:
        # findall with no groups returns the full match
        return F.regexp_extract(s3_filename, id_regex, 0)
    return F.concat_ws(
        "-", *[F.regexp_extract(s3_filename, id_regex, i) for i in range(1, n + 1)]
    )


def item_id_per_row(s3_filename: Column | str, id_regex: Column | str, max_groups: int = 4) -> Column:
    """Per-row ``id_regex`` variant — group count unknown at plan time.

    Extracts up to ``max_groups`` groups; ``regexp_extract`` returns ''
    for a group index beyond the pattern's count, and ``concat_ws``
    drops NULLs, so we NULL-out empty extractions before joining.
    Falls back to :func:`path_stem` when the regex is NULL.
    """
    if isinstance(s3_filename, str):
        s3_filename = F.col(s3_filename)
    if isinstance(id_regex, str):
        id_regex = F.col(id_regex)
    # capture-group count of the row's pattern: unescaped '(' not
    # followed by '?' (non-capturing / lookaround groups)
    grp_cnt = F.size(
        F.regexp_extract_all(id_regex, F.lit(r"(?<!\\)\((?!\?)"), F.lit(0))
    )
    parts = []
    for i in range(1, max_groups + 1):
        # regexp_extract raises on idx > group count, so gate each index
        # behind a lazily-evaluated when(); the SQL form (call_function)
        # accepts a per-row pattern column unlike the Python API
        g = F.when(
            grp_cnt >= i,
            F.call_function("regexp_extract", s3_filename, id_regex, F.lit(i)),
        )
        parts.append(F.when(g != "", g))
    joined = F.concat_ws("-", *parts)
    return F.when(id_regex.isNull(), path_stem(s3_filename)).otherwise(joined)
