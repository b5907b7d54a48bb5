"""zorder_write must produce files whose row-group stats are narrow in BOTH
interleaved dimensions — the property that makes 2-D scan pruning work.
A single-column sort would give span ~full-range on the other column."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from open_molecule_data_pipeline_spark.catalog import table
from open_molecule_data_pipeline_spark.operators.layout import zorder_write

from pyspark.sql import functions as F


def _file_spans(path: str, cols: tuple[str, str]) -> list[tuple[int, int]]:
    spans = []
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = (
                        st.min if mins[name] is None else min(mins[name], st.min)
                    )
                    maxs[name] = (
                        st.max if maxs[name] is None else max(maxs[name], st.max)
                    )
        if all(mins[c] is not None for c in cols):
            spans.append(tuple(maxs[c] - mins[c] for c in cols))
    return spans


def test_zorder_write_bounds_both_dims(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 256).alias("x"),
        (F.floor("o_totalprice").cast("long") % 256).alias("y"),
        "o_orderkey",
    )
    out = str(tmp_path / "zorders")
    zorder_write(o, ("x", "y"), out, n_files=8)

    spans = _file_spans(out, ("x", "y"))
    assert len(spans) >= 4  # range partitioner produced real files
    # 8 files = top 3 Z bits fixed per file -> x confined to one half,
    # y to one quarter of [0,256) for interior files. Allow boundary files
    # slack: the MEAN span must be well under the unsorted full range.
    mean_x = sum(s[0] for s in spans) / len(spans)
    mean_y = sum(s[1] for s in spans) / len(spans)
    assert mean_x <= 0.7 * 255, (mean_x, spans)
    assert mean_y <= 0.7 * 255, (mean_y, spans)


def test_zorder_bounds_dim_a_single_sort_leaves_open(spark, sf_dir, tmp_path):
    """A plain sort on x leaves y unpruned (every file spans ~the full y
    range, so a y-predicate skips nothing); Z-order keeps every file's
    y-span bounded as well — the 2-D pruning win."""
    o = table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 256).alias("x"),
        (F.floor("o_totalprice").cast("long") % 256).alias("y"),
    )
    zout = str(tmp_path / "z")
    sout = str(tmp_path / "s")
    zorder_write(o, ("x", "y"), zout, n_files=8)
    (
        o.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(sout)
    )
    z_y = [sy for _, sy in _file_spans(zout, ("x", "y"))]
    s_y = [sy for _, sy in _file_spans(sout, ("x", "y"))]
    assert sum(s_y) / len(s_y) >= 0.85 * 255, s_y  # x-sort: y unpruned
    assert sum(z_y) / len(z_y) <= 0.55 * 255, z_y  # z-order: y bounded too


def _xy2d_ref(n: int, x: int, y: int) -> int:
    """Independent Python reference for the Wikipedia xy2d Hilbert transform
    (rot with the full grid size n), mirrored by _hilbert_sql()."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_sql_matches_reference_bijectively():
    """The generated CTE-chain SQL must agree with the Python reference on
    the ENTIRE 256x256 grid — and the reference itself must be a bijection
    with unit-step locality (the property that makes Hilbert ranges prune
    better than Morton ranges)."""
    import duckdb

    from open_molecule_data_pipeline_spark.operators.layout import (
        _HILBERT_N,
        _hilbert_sql,
    )

    n = _HILBERT_N
    # swap the events-derived pts CTE for the full grid, keyed by event_id
    sql = _hilbert_sql().replace(
        f"""pts AS (
  SELECT event_id,
         (event_id * 37) % {n} AS x,
         (event_id * 101) % {n} AS y,
         0 AS d
  FROM events
)""",
        f"""pts AS (
  SELECT i AS event_id, i % {n} AS x,
         cast(floor(i / {n}) AS BIGINT) % {n} AS y, 0 AS d
  FROM (SELECT unnest(range({n * n})) AS i)
)""",
    )
    # keep per-point d rather than the bucket aggregate
    head, _, _ = sql.rpartition("SELECT cast(floor(l.d / 1024)")
    per_point = (
        head + "SELECT p.x AS x, p.y AS y, l.d AS d "
        "FROM lev7 l JOIN pts p ON l.event_id = p.event_id"
    )
    rows = duckdb.sql(per_point).fetchall()
    assert len(rows) == n * n
    seen = set()
    for x, y, d in rows:
        assert d == _xy2d_ref(n, x, y), (x, y, d)
        seen.add(d)
    assert len(seen) == n * n  # bijection
