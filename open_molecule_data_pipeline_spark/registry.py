"""Central registry of named queries with their DuckDB oracle twins.

Every operator the engine claims is registered here via :func:`register`,
giving one source of truth for ``__spark_entry__.queries()`` /
``oracle_sql()``, the pytest parity suite, and ``bench.py``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}

_QUERY_MODULES = (
    "open_molecule_data_pipeline_spark.operators.relational",
    "open_molecule_data_pipeline_spark.operators.tpch_extra",
    "open_molecule_data_pipeline_spark.operators.tpch_extra2",
    "open_molecule_data_pipeline_spark.operators.scalar_funcs",
    "open_molecule_data_pipeline_spark.operators.extra_funcs",
    "open_molecule_data_pipeline_spark.operators.funcs_extra2",
    "open_molecule_data_pipeline_spark.operators.funcs_extra3",
    "open_molecule_data_pipeline_spark.operators.ml_extra",
    "open_molecule_data_pipeline_spark.operators.semantics_extra",
    "open_molecule_data_pipeline_spark.operators.setops_extra",
    "open_molecule_data_pipeline_spark.operators.stats",
    "open_molecule_data_pipeline_spark.operators.mllib_lsh",
    "open_molecule_data_pipeline_spark.operators.cdc",
    "open_molecule_data_pipeline_spark.operators.graph",
    "open_molecule_data_pipeline_spark.operators.windows",
    "open_molecule_data_pipeline_spark.operators.windows_extra",
    "open_molecule_data_pipeline_spark.operators.timeseries",
    "open_molecule_data_pipeline_spark.operators.dedup",
    "open_molecule_data_pipeline_spark.operators.similarity",
    "open_molecule_data_pipeline_spark.operators.text",
    "open_molecule_data_pipeline_spark.operators.text_pipeline",
    "open_molecule_data_pipeline_spark.operators.multimodal",
    "open_molecule_data_pipeline_spark.operators.ingest_demo",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


LOAD_ERRORS: dict[str, str] = {}


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry.

    A module that fails to import (missing optional dep, environment skew)
    costs only its own queries, not the whole driver contract; failures are
    recorded in ``LOAD_ERRORS`` for inspection.
    """
    import warnings

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover - env-dependent
            LOAD_ERRORS[mod] = repr(exc)
            warnings.warn(
                f"query module {mod} failed to import; its queries are "
                f"missing from the contract: {exc!r}",
                RuntimeWarning,
                stacklevel=2,
            )
    return QUERIES
