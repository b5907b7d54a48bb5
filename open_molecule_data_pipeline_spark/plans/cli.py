"""CLI: ``download`` (mirror archives), ``ingest`` (parse -> NDJSON),
``stream`` (incremental landing-dir ingest) and ``query`` (run any
registered analytic query against a table directory).

Parity with the reference's two click verbs (reference ``ingestion/cli.py:
15-46``), argparse-based to stay dependency-light; the extra verbs expose
the engine surface the reference never had.

Usage::

    python -m open_molecule_data_pipeline_spark.plans.cli ingest --config job.yaml
    python -m open_molecule_data_pipeline_spark.plans.cli download --config job.yaml
    python -m open_molecule_data_pipeline_spark.plans.cli query agg_pricing_summary \\
        --sf-dir /data/sf100 --out /results/q1 --format parquet
    python -m open_molecule_data_pipeline_spark.plans.cli query --list
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
    pq = sub.add_parser(
        "query",
        help="run a registered analytic query against a parquet table dir",
    )
    pq.add_argument("name", nargs="?", help="registered query name")
    pq.add_argument("--sf-dir", help="directory holding the parquet tables")
    pq.add_argument(
        "--out", help="write the result here instead of printing a preview"
    )
    pq.add_argument(
        "--format", default="parquet", choices=("parquet", "csv", "json")
    )
    pq.add_argument(
        "--limit", type=int, default=20, help="preview row cap (no --out)"
    )
    pq.add_argument(
        "--list", action="store_true", help="list registered query names"
    )
    args = parser.parse_args(argv)

    if args.command == "query":
        from ..registry import load_all

        specs = load_all()
        if args.list or not args.name:
            for name, spec in sorted(specs.items()):
                tags = ",".join(spec.tags)
                print(f"{name}\t[{tags}]")
            return 0
        if args.name not in specs:
            print(f"unknown query: {args.name!r} (try --list)", file=sys.stderr)
            return 2
        if not args.sf_dir:
            print("--sf-dir is required to run a query", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"omdp-query-{args.name}")
        df = specs[args.name].fn(spark, args.sf_dir)
        if args.out:
            df.write.mode("overwrite").format(args.format).save(args.out)
            print(f"{args.name}: wrote {args.format} -> {args.out}")
        else:
            df.show(args.limit, truncate=False)
        return 0

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
