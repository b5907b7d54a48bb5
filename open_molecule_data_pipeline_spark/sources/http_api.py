"""Cursor-paginated HTTP JSON API source.

Parity with the reference's generic HTTP connector (reference
``ingestion/common.py:126-243``) and its ChemSpider preset
(``chemspider.py:10-30``): build a GET from base_url/endpoint/params plus
the cursor, retry with exponential backoff, extract the record list and the
next cursor by JSON path, loop until the cursor is null.

The cursor chain is inherently sequential (page N+1 needs page N's
response), so fetching stays on the driver — the cluster parallelizes the
*downstream* processing: each page lands as a DataFrame (Arrow batch), and
:func:`fetch_to_dataframe` unions pages so the parse/normalize/write plan
runs distributed. The fetcher is dependency-injected for tests, mirroring
the reference's client-factory seam (``runner.py:126-147``).
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator, Mapping
from dataclasses import dataclass, field, fields
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..functions.molecule import MOLECULE_SCHEMA

Fetcher = Callable[[str], Mapping[str, Any]]


def extract_json_path(payload: Any, path: list[str]) -> Any:
    """Walk keys through nested mappings; None when a hop is missing
    (reference ``common.py:109-120``)."""
    cur = payload
    for key in path:
        if not isinstance(cur, Mapping) or key not in cur:
            return None
        cur = cur[key]
    return cur


@dataclass
class HttpSourceConfig:
    name: str
    base_url: str
    endpoint: str
    params: dict[str, Any] = field(default_factory=dict)
    batch_size: int = 1000
    batch_param: str | None = None
    cursor_param: str = "cursor"
    records_path: list[str] = field(default_factory=lambda: ["records"])
    cursor_path: list[str] = field(default_factory=lambda: ["next"])
    identifier_field: str = "id"
    smiles_field: str = "smiles"
    metadata_fields: list[str] | None = None
    max_retries: int = 5
    backoff_base: float = 0.5
    backoff_cap: float = 5.0
    # Offset pagination ("page=N" style, page count known up front): unlike
    # a cursor chain, page fetches are independent, so the Python Data
    # Source fans a single source out across executors in ranges of
    # ``pages_per_partition`` — the parallel path for one giant endpoint.
    pagination: str = "cursor"  # "cursor" | "offset"
    page_param: str = "page"
    total_pages: int | None = None  # required for pagination="offset"
    pages_per_partition: int = 8


def chemspider_config(name: str = "chemspider", **overrides) -> HttpSourceConfig:
    """Preset mirroring the reference's ChemSpider connector defaults
    (``chemspider.py:10-30``)."""
    cfg = HttpSourceConfig(
        name=name,
        base_url="https://api.rsc.org",
        endpoint="compounds/v1/filter/smiles",
        batch_param="count",
        cursor_param="token",
        records_path=["results"],
        cursor_path=["next"],
        identifier_field="csid",
        smiles_field="smiles",
        metadata_fields=["inchi_key", "formula"],
    )
    valid = {f.name for f in fields(HttpSourceConfig)}
    for k, v in overrides.items():
        if k not in valid:
            raise TypeError(f"unknown chemspider option: {k!r}")
        setattr(cfg, k, v)
    return cfg


def _default_fetcher(url: str) -> Mapping[str, Any]:  # pragma: no cover - network
    with urllib.request.urlopen(url, timeout=60) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _fetch_with_retry(fetcher: Fetcher, url: str, cfg: HttpSourceConfig):
    """Exponential backoff 0.5s -> 5s cap, 5 attempts (reference
    ``common.py:93-106``)."""
    delay = cfg.backoff_base
    for attempt in range(cfg.max_retries):
        try:
            return fetcher(url)
        except Exception:
            if attempt == cfg.max_retries - 1:
                raise
            time.sleep(delay)
            delay = min(delay * 2, cfg.backoff_cap)


def _build_url(cfg: HttpSourceConfig, cursor: Mapping[str, Any] | None) -> str:
    params = dict(cfg.params)
    if cfg.batch_param:
        params[cfg.batch_param] = cfg.batch_size
    if cursor:
        params.update(cursor)
    query = urllib.parse.urlencode(params)
    base = cfg.base_url.rstrip("/")
    endpoint = cfg.endpoint.lstrip("/")
    return f"{base}/{endpoint}" + (f"?{query}" if query else "")


def _parse_records(cfg: HttpSourceConfig, payload: Mapping[str, Any]) -> list[tuple]:
    items = extract_json_path(payload, cfg.records_path) or []
    if not isinstance(items, list):
        return []
    rows = []
    for item in items:
        if not isinstance(item, Mapping):
            # skip malformed entries rather than abort the run (parity with
            # the reference's isinstance guard, common.py:188)
            continue
        identifier = item.get(cfg.identifier_field)
        smiles = item.get(cfg.smiles_field)
        meta_keys = (
            cfg.metadata_fields
            if cfg.metadata_fields is not None
            else [
                k
                for k in item
                if k not in (cfg.identifier_field, cfg.smiles_field)
            ]
        )
        metadata = {
            k: str(item[k]) for k in meta_keys if item.get(k) not in (None, "")
        }
        rows.append(
            (
                cfg.name,
                str(identifier) if identifier is not None else None,
                str(smiles) if smiles is not None else None,
                metadata,
            )
        )
    return rows


def _next_cursor(cfg: HttpSourceConfig, payload) -> Mapping[str, Any] | None:
    value = extract_json_path(payload, cfg.cursor_path)
    if value is None:
        return None
    if isinstance(value, Mapping):
        return dict(value)
    return {cfg.cursor_param: value}


def fetch_pages(
    cfg: HttpSourceConfig,
    *,
    fetcher: Fetcher = _default_fetcher,
    start_cursor: Mapping[str, Any] | None = None,
) -> Iterator[tuple[list[tuple], Mapping[str, Any] | None]]:
    """Yield (records, next_cursor) per page until the cursor chain ends."""
    cursor = start_cursor
    while True:
        payload = _fetch_with_retry(fetcher, _build_url(cfg, cursor), cfg)
        records = _parse_records(cfg, payload)
        cursor = _next_cursor(cfg, payload)
        yield records, cursor
        if cursor is None:
            return


def fetch_to_dataframe(
    spark: SparkSession,
    cfg: HttpSourceConfig,
    *,
    fetcher: Fetcher = _default_fetcher,
    max_pages: int | None = None,
    rows_per_chunk: int = 50_000,
) -> DataFrame:
    """Drain the cursor chain into one canonical-record DataFrame.

    Pages are flushed into DataFrame chunks as they arrive and unioned, so
    driver memory holds at most ``rows_per_chunk`` raw rows at a time (a
    long cursor chain never accumulates the whole dataset driver-side).
    """
    chunks: list[DataFrame] = []
    buf: list[tuple] = []

    def flush() -> None:
        nonlocal buf
        if buf:
            chunks.append(spark.createDataFrame(buf, schema=MOLECULE_SCHEMA))
            buf = []

    for i, (records, _cursor) in enumerate(fetch_pages(cfg, fetcher=fetcher)):
        buf.extend(records)
        if len(buf) >= rows_per_chunk:
            flush()
        if max_pages is not None and i + 1 >= max_pages:
            break
    flush()
    if not chunks:
        return spark.createDataFrame([], schema=MOLECULE_SCHEMA)
    out = chunks[0]
    for chunk in chunks[1:]:
        out = out.unionByName(chunk)
    return out
