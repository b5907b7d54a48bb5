"""Every registered query must match its DuckDB oracle twin exactly
(row count + column names + canonicalized values) — the local replica of
the driver's CORRECTNESS gate. Oracle-less queries get a rows-run check."""

from __future__ import annotations

import pytest

from open_molecule_data_pipeline_spark.registry import load_all

from ._compare import assert_parity

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    assert_parity(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_no_registry_load_errors():
    """A module that fails to import silently drops its queries from the
    driver contract — that must never pass CI."""
    from open_molecule_data_pipeline_spark import registry

    registry.load_all()
    assert registry.LOAD_ERRORS == {}
