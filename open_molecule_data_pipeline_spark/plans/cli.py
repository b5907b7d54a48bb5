"""CLI: ``download`` (mirror archives) and ``ingest`` (parse -> NDJSON).

Parity with the reference's two click verbs (reference ``ingestion/cli.py:
15-46``), argparse-based to stay dependency-light.

Usage::

    python -m open_molecule_data_pipeline_spark.plans.cli ingest --config job.yaml
    python -m open_molecule_data_pipeline_spark.plans.cli download --config job.yaml
"""

from __future__ import annotations

import argparse
import sys

from ..session import get_spark
from .config import load_config
from .runner import run_ingestion


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="omdp-spark")
    sub = parser.add_subparsers(dest="command", required=True)
    for cmd, help_ in (
        ("download", "mirror source archives listed in each source manifest"),
        ("ingest", "parse cached archives / APIs into gzip NDJSON batches"),
    ):
        p = sub.add_parser(cmd, help=help_)
        p.add_argument("--config", required=True, help="job YAML path")
    ps = sub.add_parser(
        "stream",
        help="incrementally ingest NDJSON batch files from a landing dir "
        "(Structured Streaming checkpoint = resumable, exactly-once)",
    )
    ps.add_argument("--landing", required=True, help="landing directory to watch")
    ps.add_argument("--output", required=True, help="parquet output directory")
    ps.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    ps.add_argument(
        "--continuous",
        action="store_true",
        help="keep running (default: drain available files and exit)",
    )
    args = parser.parse_args(argv)

    if args.command == "stream":
        from ..streaming.jobs import stream_ndjson_ingest

        spark = get_spark(app_name="omdp-stream")
        writer = stream_ndjson_ingest(
            spark, args.landing, args.output, args.checkpoint
        )
        if args.continuous:
            query = writer.start()
            query.awaitTermination()  # pragma: no cover - interactive mode
        else:
            query = writer.trigger(availableNow=True).start()
            query.awaitTermination()
        print(f"stream: drained {args.landing} -> {args.output}")
        return 0

    config = load_config(args.config)
    spark = get_spark(app_name=f"omdp-{args.command}")
    mode = "parse" if args.command == "ingest" else "download"
    summaries = run_ingestion(spark, config, mode=mode)
    for s in summaries:
        print(
            f"{s.name}: completed={s.completed} batches={s.total_batches} "
            f"records={s.records_written}"
        )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
