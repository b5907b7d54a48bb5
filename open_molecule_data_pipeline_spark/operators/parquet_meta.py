"""Parquet footer-statistics audit (r10): metadata-only table health.

``layout_footer_stats`` writes a deterministic 16-file layout of events
(pid = event_id % 16, one file per pid via repartition-by-pid +
partitionBy) and then audits it by reading ONLY the parquet FOOTERS —
row counts, row-group counts, and the event_id min/max aggregated from
row-group column statistics — through pyarrow inside ``mapInPandas``
(one Arrow batch of file paths per task; no data pages are ever
decoded). This is the planner's-eye view of a table: at 100 TB the same
audit costs one footer read per file (a few KB each, file-parallel)
instead of a scan, which is how engines decide compaction, clustering
quality, and skipping effectiveness. The oracle recomputes the same
numbers the honest way — from the rows — so agreement proves the footer
statistics faithfully describe the data (a stats-corruption screen).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_N_FILES = 16

_FOOTER_ORACLE = f"""
SELECT cast(event_id % {_N_FILES} AS BIGINT) AS pid,
       cast(count(*) AS BIGINT) AS n_rows,
       cast(min(event_id) AS BIGINT) AS min_event_id,
       cast(max(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_id % {_N_FILES}
"""


@register(
    "layout_footer_stats",
    oracle=_FOOTER_ORACLE,
    tags=("formats", "layout", "profile"),
)
def layout_footer_stats(spark, sf_dir):
    from .file_formats import _scratch

    e = table(spark, sf_dir, "events").select(
        "event_id", (F.col("event_id") % _N_FILES).alias("pid")
    )
    out = _scratch("footer_stats", sf_dir)
    (
        e.repartition(_N_FILES, "pid")
        .write.mode("overwrite")
        .partitionBy("pid")
        .parquet(str(out))
    )

    paths = []
    for root, _dirs, files in os.walk(str(out)):
        for fn in files:
            if fn.endswith(".parquet"):
                pid = int(root.rsplit("pid=", 1)[1])
                paths.append((pid, os.path.join(root, fn)))
    pdf = spark.createDataFrame(paths, "pid long, path string").repartition(
        _N_FILES
    )

    def footer_audit(batches):
        import pyarrow.parquet as pq

        for pdf_batch in batches:
            rows = []
            for pid, path in zip(pdf_batch["pid"], pdf_batch["path"]):
                md = pq.ParquetFile(path).metadata
                idx = md.schema.to_arrow_schema().get_field_index("event_id")
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                rows.append((int(pid), md.num_rows, md.num_row_groups, lo, hi))
            yield pd.DataFrame(
                rows,
                columns=["pid", "f_rows", "f_row_groups", "f_min", "f_max"],
            )

    audited = pdf.mapInPandas(
        footer_audit,
        "pid long, f_rows long, f_row_groups long, f_min long, f_max long",
    )
    # files-per-pid robustness: aggregate footer rows per pid (exactly one
    # file each here, but the audit must not assume it)
    return audited.groupBy("pid").agg(
        F.sum("f_rows").alias("n_rows"),
        F.min("f_min").alias("min_event_id"),
        F.max("f_max").alias("max_event_id"),
    )
