"""open_molecule_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference project
``downsea/open-molecule-data-pipeline`` (an ingestion toolkit for
billion-scale SMILES data), re-expressed Spark-first:

- ``sources/``   — SDF / delimited-SMILES / manifest / paginated-HTTP readers
  (reference: ``src/open_molecule_data_pipeline/ingestion/``).
- ``sinks/``     — gzip NDJSON batch sink + Markdown run report
  (reference: ``ingestion/common.py:251-276``, ``ingestion/runner.py:317-385``).
- ``plans/``     — declarative YAML job config -> DataFrame pipelines + CLI
  (reference: ``ingestion/runner.py``, ``ingestion/cli.py``).
- ``operators/`` — the relational/analytic operator surface (joins, aggs,
  windows, dedup, similarity search, text analysis, as-of joins) the
  reference only planned (``docs/system-plan.md:16-38``), built on the
  DataFrame API so Catalyst/Tungsten/AQE drive physical execution.
- ``functions/`` — scalar/text function helpers shared by operators.
- ``streaming/`` — Structured Streaming equivalents of the reference's
  checkpointed incremental ingestion (``ingestion/common.py:38-75``).

Everything here derives from public knowledge: the Apache Spark / PySpark
API and the reference repository's observable behavior.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
