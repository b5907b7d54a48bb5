"""Randomized validation of the as-of join operator against
pandas.merge_asof (an independent reference implementation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from open_molecule_data_pipeline_spark.operators.asof import asof_join


@pytest.mark.parametrize("seed", [7, 21, 1337])
def test_asof_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    n_left, n_right, n_keys = 300, 200, 12

    left_pd = pd.DataFrame(
        {
            "lid": np.arange(n_left),
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 10_000, n_left),
        }
    )
    right_pd = pd.DataFrame(
        {
            "rid": np.arange(n_right),
            "rk": rng.integers(0, n_keys, n_right),
            "rt": rng.integers(0, 10_000, n_right),
            "payload": rng.normal(size=n_right).round(6),
        }
    )

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = (
        asof_join(
            left,
            right,
            left_on="k",
            right_on="rk",
            left_time="t",
            right_time="rt",
            value_cols=["rid", "payload"],
            right_tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    # reference: merge_asof per key; sorted by (rt, rid) so ties resolve to
    # the greatest rid, matching the operator's tie-break contract
    right_sorted = right_pd.sort_values(["rt", "rid"]).reset_index(drop=True)
    expected = pd.merge_asof(
        left_pd.sort_values("t"),
        right_sorted,
        left_on="t",
        right_on="rt",
        left_by="k",
        right_by="rk",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)

    assert len(got) == n_left
    got_rid = got["rid"].astype("float64")
    exp_rid = expected["rid"].astype("float64")
    pd.testing.assert_series_equal(got_rid, exp_rid, check_names=False)
    pd.testing.assert_series_equal(
        got["payload"].astype("float64"),
        expected["payload"].astype("float64"),
        check_names=False,
    )


def test_asof_null_values_from_latest_row(spark):
    """A matching right row with a NULL value column must still win over
    older non-null rows (last-row semantics, not last-non-null-value)."""
    left = spark.createDataFrame([(1, 1, 3)], "lid long, k long, t long")
    right = spark.createDataFrame(
        [(10, 1, 1, 5.0), (11, 1, 2, None)],
        "rid long, rk long, rt long, payload double",
    )
    out = asof_join(
        left, right, left_on="k", right_on="rk", left_time="t",
        right_time="rt", value_cols=["rid", "payload"], right_tiebreak="rid",
    ).collect()[0]
    assert out.rid == 11          # latest matching row
    assert out.payload is None    # its value, even though null


@pytest.mark.parametrize("seed,tol", [(7, 500), (21, 50), (99, 2000)])
def test_asof_tolerance_matches_pandas(spark, seed, tol):
    """The tolerance composition ts_asof_tolerance_30m relies on (run the
    UNBOUNDED as-of carrying the matched right time, then null matches
    older than the window) must equal pandas.merge_asof(tolerance=...) —
    the latest-overall-if-within == latest-within identity, validated on
    random data across three tolerance regimes."""
    import datetime

    rng = np.random.default_rng(seed)
    n_left, n_right, n_keys = 300, 200, 12
    left_pd = pd.DataFrame(
        {
            "lid": np.arange(n_left),
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 10_000, n_left),
        }
    )
    right_pd = pd.DataFrame(
        {
            "rid": np.arange(n_right),
            "rk": rng.integers(0, n_keys, n_right),
            "rt": rng.integers(0, 10_000, n_right),
        }
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    from pyspark.sql import functions as F

    joined = asof_join(
        left, right, left_on="k", right_on="rk", left_time="t",
        right_time="rt", value_cols=["rid", "rt"], right_tiebreak="rid",
    )
    fresh = F.col("rt") >= F.col("t") - tol
    got = (
        joined.select(
            "lid", F.when(fresh, F.col("rid")).alias("rid")
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    right_sorted = right_pd.sort_values(["rt", "rid"]).reset_index(drop=True)
    expected = pd.merge_asof(
        left_pd.sort_values("t"),
        right_sorted,
        left_on="t",
        right_on="rt",
        left_by="k",
        right_by="rk",
        direction="backward",
        allow_exact_matches=True,
        tolerance=tol,
    ).sort_values("lid").reset_index(drop=True)

    pd.testing.assert_series_equal(
        got["rid"].astype("float64"),
        expected["rid"].astype("float64"),
        check_names=False,
    )
    # the bound must actually bite in at least one regime for the test to
    # mean anything: with tol=50 some matches are stale
    if tol == 50:
        assert got["rid"].isna().sum() > 0
