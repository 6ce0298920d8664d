"""Payload fetch — the reference's download stage as an engine operator.

Reference behavior: every Lambda that touches a granule first downloads
it to local disk (``lambdas/cogify/handler.py:49-71`` ``download_file``,
``lambdas/data-transfer/handler.py`` S3 copy).  Here that step is a
REAL streaming fetch usable from executors:

- ``file://`` URLs and bare local paths short-circuit through the same
  chunked copy loop — which is what lets the full code path (URL parse,
  stream, size cap, checksum) be driven and tested in this offline
  sandbox;
- ``http(s)://`` uses stdlib ``urllib.request`` with a timeout and
  1 MiB chunked streaming (works wherever the cluster has egress; in
  this sandbox the connection error is captured, not raised, by the
  DataFrame operator).  Protected-granule auth matches the reference's
  Earthdata flow (``lambdas/cogify/handler.py:49-71``: ``session.auth
  = (EARTHDATA_USERNAME, EARTHDATA_PASSWORD)``): pass ``auth=(user,
  password)`` / extra ``headers``, or leave ``auth=None`` to pick up
  ``EARTHDATA_USERNAME``/``EARTHDATA_PASSWORD`` from the environment —
  a 401 challenge is answered once with HTTP Basic credentials;
- ``s3://`` uses boto3 when installed, else raises a NAMED error (the
  netCDF4-fast-path pattern: the seam is explicit, not silent).

:func:`fetch_stage` is the DataFrame form: Arrow ``mapInPandas``, one
fetch per row, survivorship errors (a failed URL yields a row with
``error`` set and flows on to the quarantine split, SURVEY T4/T5 —
never a task failure taking 10^4 good rows down with it).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import urllib.parse
import urllib.request
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CHUNK = 1 << 20  # 1 MiB streaming chunks


def _default_auth() -> tuple[str, str] | None:
    """The reference's credential source: ``EARTHDATA_USERNAME`` /
    ``EARTHDATA_PASSWORD`` env vars (``lambdas/cogify/handler.py:53-54``).
    Returns None unless BOTH are set."""
    user = os.environ.get("EARTHDATA_USERNAME")
    password = os.environ.get("EARTHDATA_PASSWORD")
    if user and password:
        return (user, password)
    return None


def _open_http(
    url: str,
    timeout: float,
    auth: tuple[str, str] | None,
    headers: dict[str, str] | None,
):
    """Open an http(s) URL; on a 401 challenge, retry ONCE with HTTP
    Basic credentials (the Earthdata protected-granule flow).  Auth is
    sent only AFTER a challenge, never preemptively — credentials don't
    leak to servers that didn't ask."""
    import urllib.error

    req = urllib.request.Request(url, headers=dict(headers or {}))
    try:
        return urllib.request.urlopen(req, timeout=timeout)  # noqa: S310
    except urllib.error.HTTPError as exc:
        if exc.code != 401 or auth is None:
            raise
        exc.close()
        import base64

        token = base64.b64encode(
            f"{auth[0]}:{auth[1]}".encode()
        ).decode("ascii")
        authed = urllib.request.Request(
            url,
            headers={
                **dict(headers or {}),
                "Authorization": f"Basic {token}",
            },
        )
        return urllib.request.urlopen(authed, timeout=timeout)  # noqa: S310


def fetch_to_local(
    url: str,
    dest_dir: str | None = None,
    timeout: float = 30.0,
    max_bytes: int | None = None,
    auth: tuple[str, str] | None = None,
    headers: dict[str, str] | None = None,
) -> str:
    """Fetch ``url`` to a local temp file, returning its path.

    Streams in 1 MiB chunks (never buffers the whole payload — raster
    granules are GBs); ``max_bytes`` aborts oversized downloads early
    with a named error.  ``auth``/``headers`` apply to the http(s)
    branch only; ``auth=None`` falls back to the Earthdata env vars.
    See module docstring for scheme support.
    """
    scheme = urllib.parse.urlparse(url).scheme
    if scheme in ("", "file"):
        src_path = urllib.request.url2pathname(
            urllib.parse.urlparse(url).path
        ) if scheme == "file" else url
        opener = open(src_path, "rb")
    elif scheme in ("http", "https"):
        opener = _open_http(
            url, timeout, auth if auth is not None else _default_auth(),
            headers,
        )
    elif scheme == "s3":
        try:
            import boto3  # noqa: F401
        except ImportError as exc:
            raise RuntimeError(
                f"s3 fetch for {url!r} requires boto3, which is not "
                "installed in this environment; install it or stage the "
                "object behind file:///https:// first"
            ) from exc
        parsed = urllib.parse.urlparse(url)
        fd, dest = tempfile.mkstemp(
            dir=dest_dir, suffix=os.path.basename(parsed.path) or ".bin"
        )
        os.close(fd)
        import boto3

        boto3.client("s3").download_file(
            parsed.netloc, parsed.path.lstrip("/"), dest
        )
        return dest
    else:
        raise ValueError(f"unsupported URL scheme {scheme!r} in {url!r}")

    base = os.path.basename(urllib.parse.urlparse(url).path or url)
    fd, dest = tempfile.mkstemp(
        dir=dest_dir, suffix=("_" + base[-40:]) if base else ".bin"
    )
    total = 0
    try:
        with os.fdopen(fd, "wb") as out, opener as src:
            while True:
                chunk = src.read(_CHUNK)
                if not chunk:
                    break
                total += len(chunk)
                if max_bytes is not None and total > max_bytes:
                    raise ValueError(
                        f"payload exceeds max_bytes={max_bytes}: {url!r}"
                    )
                out.write(chunk)
    except BaseException:
        try:
            os.unlink(dest)
        except OSError:
            pass
        raise
    return dest


def fetch_stage(
    df: DataFrame,
    url_col: str = "s3_filename",
    dest_dir: str | None = None,
    timeout: float = 30.0,
    max_bytes: int | None = None,
    keep_payload: bool = False,
    auth: tuple[str, str] | None = None,
    headers: dict[str, str] | None = None,
) -> DataFrame:
    """Per-row fetch via Arrow ``mapInPandas`` — the reference's
    download loop distributed over executors.

    Adds ``local_path`` (fetched temp file), ``n_bytes``, ``sha256``,
    and ``error`` (NULL on success; failed rows survive with the
    message).  ``keep_payload=True`` additionally inlines the bytes as
    a ``payload`` binary column (only for payloads that fit the Arrow
    batch budget — raster granules should stay path-referenced, the
    multimodal small-asset path may inline).  ``auth``/``headers``
    ride the closure to executors (or set the Earthdata env vars on
    the executors and leave ``auth=None``).
    """
    added = ["local_path", "n_bytes", "sha256", "error"] + (
        ["payload"] if keep_payload else []
    )
    clash = [c for c in added if c in df.columns]
    if clash:
        raise ValueError(
            f"fetch_stage output columns {clash} already exist on the "
            "input — rename them first"
        )
    fields = (
        "local_path string, n_bytes bigint, sha256 string, error string"
    )
    if keep_payload:
        fields += ", payload binary"
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + fields

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, sizes, digests, errors = [], [], [], []
            payloads: list[bytes | None] = []
            for url in pdf[url_col]:
                try:
                    p = fetch_to_local(
                        str(url), dest_dir, timeout, max_bytes,
                        auth=auth, headers=headers,
                    )
                    h = hashlib.sha256()
                    n = 0
                    with open(p, "rb") as f:
                        while True:
                            chunk = f.read(_CHUNK)
                            if not chunk:
                                break
                            h.update(chunk)
                            n += len(chunk)
                    paths.append(p)
                    sizes.append(n)
                    digests.append(h.hexdigest())
                    errors.append(None)
                    if keep_payload:
                        with open(p, "rb") as f:
                            payloads.append(f.read())
                except Exception as exc:  # survivorship: capture, flow on
                    paths.append(None)
                    sizes.append(0)
                    digests.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
                    if keep_payload:
                        payloads.append(None)
            out = pdf.copy()
            out["local_path"] = paths
            out["n_bytes"] = sizes
            out["sha256"] = digests
            out["error"] = errors
            if keep_payload:
                out["payload"] = payloads
            yield out

    return df.mapInPandas(run, schema)
