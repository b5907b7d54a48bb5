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
