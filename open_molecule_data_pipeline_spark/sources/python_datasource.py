"""Spark 4 Python Data Source for the cursor-paginated HTTP connector.

The driver-pump flavor lives in ``http_api.py``; this is the same
connector surface (reference ``ingestion/common.py:126-243``) expressed as
a first-class ``spark.read.format("omdp_http")`` source via the Spark 4
Python Data Source API (``pyspark.sql.datasource``):

- one ``InputPartition`` per configured source — sources fetch in
  parallel across executors (the Spark-native analog of the reference's
  per-source thread pool, ``runner.py:409-430``), while each source's
  cursor chain stays sequential inside its partition, which is the
  protocol's real constraint;
- rows stream out of ``read()`` as they are parsed, so downstream
  operators pipeline instead of waiting for the whole crawl;
- the fetch seam is injectable: a ``pages`` option carries canned JSON
  payloads for hermetic tests (the reference's client-factory seam,
  ``runner.py:126-147``); without it the worker fetches over HTTP with
  the same retry/backoff policy as the driver pump.

At 100 TB-scale ingestion the fan-out unit is the *source* (hundreds of
tranche endpoints), so partition-per-source is the right granularity for
cursor-chained APIs — a cursor chain is bounded by its own protocol, not
by Spark. For OFFSET-paginated APIs (``pagination="offset"``, page count
known up front) the pages are independent, so a single giant endpoint
additionally fans out as one partition per ``pages_per_partition`` page
range — closing the "sequential cursor chain" limitation wherever the
protocol allows it.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .http_api import (
    HttpSourceConfig,
    _build_url,
    _default_fetcher,
    _fetch_with_retry,
    _next_cursor,
    _parse_records,
)

FORMAT_NAME = "omdp_http"

_SCHEMA_DDL = (
    "source string, identifier string, smiles string, metadata map<string,string>"
)


class HttpApiDataSource(DataSource):
    """``spark.read.format("omdp_http")`` — options:

    - ``configs``: JSON list of ``HttpSourceConfig`` field dicts (required)
    - ``pages``: JSON ``{source_name: [payload, ...]}`` canned responses
      replayed in order instead of real HTTP (tests / dry runs)
    - ``fail_first``: int — the canned fetcher raises on its first N calls
      per partition, proving the executor-side fetch goes through the same
      exponential-backoff retry policy as the driver pump (X3 parity)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> "HttpApiReader":
        return HttpApiReader(self.options)


class HttpApiReader(DataSourceReader):
    def __init__(self, options) -> None:
        raw = options.get("configs")
        if not raw:
            raise ValueError("omdp_http requires a 'configs' option (JSON list)")
        self._configs = [HttpSourceConfig(**c) for c in json.loads(raw)]
        pages = options.get("pages")
        self._pages = json.loads(pages) if pages else None
        self._fail_first = int(options.get("fail_first", 0))

    def partitions(self) -> Sequence[InputPartition]:
        """Cursor sources: one partition each (the chain is sequential).
        Offset sources: one partition per ``pages_per_partition`` page
        range — a single giant endpoint fans out across executors."""
        parts: list[InputPartition] = []
        for i, cfg in enumerate(self._configs):
            if cfg.pagination == "offset":
                if not cfg.total_pages:
                    raise ValueError(
                        f"source {cfg.name!r}: pagination='offset' requires "
                        "total_pages"
                    )
                step = max(1, cfg.pages_per_partition)
                for start in range(0, cfg.total_pages, step):
                    end = min(start + step, cfg.total_pages)
                    parts.append(InputPartition((i, start, end)))
            else:
                parts.append(InputPartition((i, None, None)))
        return parts

    def _canned_fetcher(self, cfg):
        canned = list(self._pages.get(cfg.name, []))
        failures = [self._fail_first]

        def fetcher(url: str):
            if failures[0] > 0:
                failures[0] -= 1
                raise ConnectionError("injected transient failure")
            if cfg.pagination == "offset":
                # payloads indexed by page number, parsed from the URL —
                # order-independent, as real offset endpoints are
                marker = f"{cfg.page_param}="
                page = 0
                for part in url.split("?", 1)[-1].split("&"):
                    if part.startswith(marker):
                        page = int(part[len(marker):])
                return canned[page] if page < len(canned) else {}
            if not canned:
                return {}
            return canned.pop(0)

        return fetcher

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        idx, page_start, page_end = partition.value
        cfg = self._configs[idx]
        if self._pages is not None:
            fetcher = self._canned_fetcher(cfg)
        else:  # pragma: no cover - network
            fetcher = _default_fetcher

        if cfg.pagination == "offset":
            for page in range(page_start, page_end):
                url = _build_url(cfg, {cfg.page_param: page})
                payload = _fetch_with_retry(fetcher, url, cfg) or {}
                yield from _parse_records(cfg, payload)
            return

        cursor = None
        while True:
            url = _build_url(cfg, cursor)
            payload = _fetch_with_retry(fetcher, url, cfg) or {}
            for row in _parse_records(cfg, payload):
                yield row
            cursor = _next_cursor(cfg, payload)
            if cursor is None:
                break


def register_http_datasource(spark: SparkSession) -> None:
    """Idempotent registration of the format with this session.

    The DataSource instance is cloudpickled into separate Python processes
    (executor workers; for streaming, the driver-side
    ``python_streaming_source_runner``) whose PYTHONPATH is Spark's own —
    it does NOT inherit the driver's ``sys.path``, so a by-reference pickle
    of these classes dies with ModuleNotFoundError whenever the package is
    importable only via the driver's path (e.g. a checkout not pip-
    installed). Registering the connector modules for BY-VALUE pickling
    makes the payload self-contained — the standard cloudpickle remedy for
    "worker can't import my module".
    """
    import sys

    from pyspark import cloudpickle

    from . import http_api as _http_api

    for mod in (sys.modules[__name__], _http_api):
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:  # pragma: no cover - older cloudpickle
            pass
    spark.dataSource.register(HttpApiDataSource)


def read_http_datasource(
    spark: SparkSession,
    configs: Sequence[HttpSourceConfig],
    *,
    pages: dict[str, list] | None = None,
    fail_first: int = 0,
) -> DataFrame:
    """Convenience wrapper: register + build the reader DataFrame."""
    register_http_datasource(spark)
    from dataclasses import asdict

    reader = (
        spark.read.format(FORMAT_NAME)
        .option("configs", json.dumps([asdict(c) for c in configs]))
    )
    if pages is not None:
        reader = reader.option("pages", json.dumps(pages))
    if fail_first:
        reader = reader.option("fail_first", str(fail_first))
    return reader.load()


# --------------------------------------------------------------------------
# Streaming flavor: the same paginated connector as a Spark 4 Python
# STREAMING data source (SimpleDataSourceStreamReader). Offsets are
# per-source page indices — each micro-batch drains at most one new page
# per source, the engine checkpoints {source: page} like any other stream,
# and a restart resumes mid-crawl from the committed offset (the streaming
# analog of the reference's cursor checkpoints, ``ingestion/common.py:
# 126-243``). readBetweenOffsets replays canned pages deterministically,
# which is what exactly-once replay demands of a real source too: page
# fetches must be idempotent keyed by (source, page index).
# --------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class HttpApiStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        raw = options.get("configs")
        if not raw:
            raise ValueError("omdp_http requires a 'configs' option (JSON list)")
        self._configs = [HttpSourceConfig(**c) for c in json.loads(raw)]
        pages = options.get("pages")
        # streaming needs replayable pages: canned only (a live-HTTP stream
        # source would cache fetched pages to satisfy readBetweenOffsets)
        if pages is None:
            raise ValueError(
                "omdp_http streaming requires the 'pages' option: offset "
                "replay (readBetweenOffsets) needs idempotent page reads"
            )
        self._pages = json.loads(pages)

    def initialOffset(self) -> dict:
        return {c.name: 0 for c in self._configs}

    def _rows_for(self, cfg, page_idx: int):
        canned = self._pages.get(cfg.name, [])
        if page_idx >= len(canned):
            return []
        return list(_parse_records(cfg, canned[page_idx] or {}))

    def read(self, start: dict):
        end = dict(start)
        rows: list[tuple] = []
        for cfg in self._configs:
            i = int(start.get(cfg.name, 0))
            if i < len(self._pages.get(cfg.name, [])):
                rows.extend(self._rows_for(cfg, i))
                end[cfg.name] = i + 1
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for cfg in self._configs:
            for i in range(int(start.get(cfg.name, 0)), int(end.get(cfg.name, 0))):
                rows.extend(self._rows_for(cfg, i))
        return iter(rows)


def _stream_reader(self, schema) -> HttpApiStreamReader:
    return HttpApiStreamReader(self.options)


# attached rather than defined inline so the batch reader class above stays
# the single source of truth for name/schema/options documentation
HttpApiDataSource.simpleStreamReader = _stream_reader


def read_http_datasource_stream(
    spark: SparkSession,
    configs: Sequence[HttpSourceConfig],
    *,
    pages: dict[str, list],
) -> DataFrame:
    """Convenience wrapper: register + build the readStream DataFrame."""
    register_http_datasource(spark)
    from dataclasses import asdict

    return (
        spark.readStream.format(FORMAT_NAME)
        .option("configs", json.dumps([asdict(c) for c in configs]))
        .option("pages", json.dumps(pages))
        .load()
    )
