"""10x scale-proof bench: derive an sf1-equivalent dataset from sf0.1 and
time every headline query once at both scales (VERDICT r4 #4).

The plan lints prove the SHAPES are scale-safe; this run proves the
CONSTANTS: each query's wall-clock ratio at 10x the rows, flagged when it
exceeds 2.5x the linear expectation (ratio > 25).

Derivation (keys offset per copy so every copy is referentially
self-contained; dims ``region``/``nation`` stay fixed, as in TPC-H):

- copy k of each fact/dim row gets key += k * (max_key + 1) for every key
  column (orderkey/custkey/partkey/suppkey/doc_id/vec_id/user_id/event_id)
- ``documents.text`` for copy k > 0 maps every token t -> t_k: a per-copy
  VOCABULARY BIJECTION. Cross-copy token/shingle sets are disjoint (no LSH
  band can collide across copies), while within-copy Jaccard structure is
  preserved EXACTLY — so MinHash candidate/pair counts scale exactly 10x.
  (A salting variant was tried first: ~25% junk tokens per doc left
  cross-copy Jaccard ~0.8, where the r=2/b=4 band scheme collides with
  p=0.98 — 10-doc hard-negative families and millions of singleton tokens
  in the inverted index; a different workload, not a scale-up.)
- timestamps/values/embeddings are unchanged: time-range density and
  vector geometry grow 10x in rows, not in range

Usage: python scripts/bench_scale.py [--regen]
Writes the derived tables to /tmp/omdp_scale_sf1/ (reused if present) and
prints one JSON line per scale plus a ratio table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = "/tmp/omdp_scale_sf1"
N_COPIES = 10

# key columns to offset, per table: {table: {column: offset_source_table}}
# (offset_source_table names whose max-key defines the stride, so foreign
# keys stay consistent with their referenced table's stride)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
FIXED = ("region", "nation")


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from open_molecule_data_pipeline_spark.catalog import table

    strides: dict[str, int] = {}
    for name, key in KEY_OF.items():
        strides[name] = (
            table(spark, BASE_SF, name).agg(F.max(key)).collect()[0][0] + 1
        )
    strides["events_user"] = (
        table(spark, BASE_SF, "events").agg(F.max("user_id")).collect()[0][0]
        + 1
    )

    from open_molecule_data_pipeline_spark.operators._util import (
        write_single_parquet_file,
    )

    def write_single_file(df, name: str) -> None:
        # testdata layout = one parquet FILE per table (the streaming
        # twins' pathGlobFilter matches leaf file names)
        write_single_parquet_file(df, f"{SCALE_DIR}/{name}.parquet")

    Path(SCALE_DIR).mkdir(parents=True, exist_ok=True)
    for name in FIXED:
        write_single_file(table(spark, BASE_SF, name), name)
    for name, keymap in KEYED.items():
        base = table(spark, BASE_SF, name)
        copies = []
        for k in range(N_COPIES):
            c = base
            for col, src in keymap.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(k * strides[src])).cast("long")
                )
            if name == "documents" and k > 0:
                suffix = F.lit(f"_{k}")
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda t: F.concat(t, suffix),
                        ),
                        " ",
                    ),
                )
                c = c.withColumn("n_chars", F.length("text").cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        write_single_file(out, name)
        print(f"  generated {name}: {N_COPIES}x", file=sys.stderr)


def run_once(spark, sf_dir: str, names=None) -> dict[str, float]:
    """Time the headline (bench=True) set, or an explicit name list."""
    from open_molecule_data_pipeline_spark.registry import load_all

    all_specs = load_all()
    if names:
        specs = {n: all_specs[n] for n in names}
    else:
        specs = {n: s for n, s in all_specs.items() if s.bench}
    timings = {}
    for name, spec in sorted(specs.items()):
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        start = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)
    return timings


def main() -> None:
    from open_molecule_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="omdp-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    if "--regen" in sys.argv or not Path(f"{SCALE_DIR}/lineitem.parquet").exists():
        print("generating derived sf1 dataset...", file=sys.stderr)
        generate(spark)

    names = None
    if "--names" in sys.argv:  # comma-separated explicit query list
        names = sys.argv[sys.argv.index("--names") + 1].split(",")

    # warm pass each (file listing, codegen), then min-of-2 measured —
    # single cold runs showed 3x swings on the shuffle-heavy queries
    def min_of_two(sf_dir):
        a = run_once(spark, sf_dir, names)
        b = run_once(spark, sf_dir, names)
        return {k: min(a[k], b[k]) for k in a}

    run_once(spark, BASE_SF, names)  # warm
    base = min_of_two(BASE_SF)
    run_once(spark, SCALE_DIR, names)  # warm
    scaled = min_of_two(SCALE_DIR)

    print(json.dumps({"sf": 0.1, "queries": base}))
    print(json.dumps({"sf": 1.0, "queries": scaled, "derived": True}))
    rows = []
    for name in sorted(base):
        r = scaled[name] / max(base[name], 1e-9)
        flag = " <-- SUPER-LINEAR" if r > 25 else ""
        rows.append((name, base[name], scaled[name], r, flag))
        print(f"{name:32s} {base[name]:8.3f}s {scaled[name]:8.3f}s  x{r:5.1f}{flag}")
    worst = max(rows, key=lambda t: t[3])
    print(f"worst ratio: {worst[0]} x{worst[3]:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
