"""Structured Streaming equivalents of the reference's incremental semantics.

The reference implements resumability by hand: per-source JSON checkpoints,
offset replay, write-then-checkpoint ordering (reference ``ingestion/
common.py:38-75``, ``runner.py:150-177``). Structured Streaming provides the
same guarantees natively — ``checkpointLocation`` tracks which input files
were consumed (K2/B2/X4 in SURVEY.md §2A), and ``foreachBatch`` gives the
write-then-commit ordering.

Jobs here are builders returning a ``DataStreamWriter``-ready query; tests
drive them with file sources + memory/file sinks and
``processAllAvailable()`` for deterministic completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.molecule import MOLECULE_SCHEMA

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def stream_ndjson_ingest(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 10,
):
    """Incremental NDJSON ingestion: landing dir -> parquet, exactly-once.

    The streaming replacement for the reference's batch-resume loop: new
    batch files appearing in ``landing_dir`` are discovered, parsed with the
    canonical schema (never inferred), and appended to parquet with offsets
    tracked in ``checkpoint_dir``. Restart-safe by construction.
    """
    stream = (
        spark.readStream.schema(MOLECULE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def stream_windowed_counts(
    events: DataFrame,
    *,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts — late rows beyond the watermark
    are dropped, state is bounded (the scale requirement for infinite
    streams)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def stream_sessionized(
    events: DataFrame,
    *,
    watermark: str = "10 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows with a configurable inactivity gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_ndjson_foreach_batch(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    batch_size: int = 1000,
    compress: bool = True,
):
    """Landing dir -> gzip NDJSON batches via ``foreachBatch``.

    Exactly the reference's write-then-checkpoint ordering (reference
    ``runner.py:150-177``): each micro-batch is written by our reference-
    parity sink, and only then does the engine commit the batch's offsets.
    ``batch_id`` is stable across crash replays and each batch overwrites
    its own ``batch-<id>`` directory, so a replayed batch replaces its
    previous partial output — effectively-once per batch directory.
    """
    from ..sinks.ndjson import write_ndjson

    stream = spark.readStream.schema(MOLECULE_SCHEMA).json(landing_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_ndjson(
            batch_df,
            f"{output_dir.rstrip('/')}/batch-{batch_id:06d}",
            batch_size=batch_size,
            compress=compress,
            mode="overwrite",
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def stream_running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total maintained across micro-batches.

    This is the escape hatch for operators Structured Streaming lacks
    (custom sessionization, decaying counters, online sketches): state is an
    explicit per-key tuple the function updates batch-by-batch, stored in
    the state store with the same exactly-once guarantees as built-ins.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_within_watermark(
    records: DataFrame,
    *,
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Streaming exact dedup with bounded state —
    ``dropDuplicatesWithinWatermark`` holds keys only inside the watermark
    horizon, the streaming analog of operators/dedup.py's exact tier."""
    return records.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_click_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    watermark: str = "10 minutes",
    max_delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each click to an
    impression by the same user within ``max_delay``.

    Both sides carry a watermark and the join condition bounds the event
    times against each other, so Spark can expire buffered state on both
    sides — without the time bound a stream-stream join buffers forever,
    which is the 100 TB failure mode this signature prevents.
    """
    imp = impressions.withWatermark("ts", watermark).select(
        F.col("event_id").alias("imp_id"),
        F.col("user_id").alias("imp_user"),
        F.col("ts").alias("imp_ts"),
    )
    clk = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("clk_id"),
        F.col("user_id").alias("clk_user"),
        F.col("ts").alias("clk_ts"),
    )
    return imp.join(
        clk,
        F.expr(
            "imp_user = clk_user AND clk_ts >= imp_ts "
            f"AND clk_ts <= imp_ts + INTERVAL {max_delay}"
        ),
    )


def stream_incremental_user_totals(
    spark: SparkSession,
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Incrementally maintained materialized view: per-user event totals
    kept in a keyed parquet table, upserted by each micro-batch.

    Each batch aggregates only its own rows (tiny), then merges into the
    running state with the anti-join + union MERGE emulation — the
    foreachBatch analog of a lakehouse MERGE INTO. State grows with the
    key count, not the stream length, and the per-batch cost is
    O(batch + state-touched-keys): the incremental-MV pattern a 100 TB
    event stream needs instead of full recomputes.

    Exactly-once despite foreachBatch's at-least-once contract: the merged
    batch_id is persisted INSIDE the state directory (``_LAST_BATCH_ID``,
    underscore-prefixed so parquet readers ignore it) and swaps atomically
    with the data, so a replayed batch (crash after the swap, before the
    offset commit) is detected and skipped instead of double-counted. The
    swap itself is tmp-write + rename; a crash between the two renames
    leaves only ``_old``, which the next batch restores before merging.
    """
    from pathlib import Path
    import shutil

    from pyspark.sql import functions as F

    state = Path(state_dir)
    old = state.with_name(state.name + "_old")
    tmp = state.with_name(state.name + "_tmp")
    marker = "_LAST_BATCH_ID"

    def last_merged(p: Path) -> int:
        f = p / marker
        try:
            return int(f.read_text())
        except (OSError, ValueError):
            return -1

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # crash window between state.rename(old) and tmp.rename(state):
        # no live state dir -> the previous generation in _old is current
        if not state.exists() and old.exists():
            old.rename(state)
        if state.exists() and last_merged(state) >= batch_id:
            return  # replayed batch (at-least-once foreachBatch) — idempotent
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        sess = batch_df.sparkSession
        if state.exists():
            current = sess.read.parquet(str(state))
            merged = (
                current.unionByName(delta)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        else:
            merged = delta
        merged.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        (tmp / marker).write_text(str(batch_id))
        if old.exists():
            shutil.rmtree(old)
        if state.exists():
            state.rename(old)
        tmp.rename(state)
        if old.exists():
            shutil.rmtree(old)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
