"""Quick local parity check for a subset of registered queries.

Usage: python scripts/check_queries.py name1 name2 ... [--sf /root/testdata/sf0.01]

Runs each named query against its DuckDB oracle with the same comparison
the pytest parity suite uses — the fast feedback loop while building a new
operator, without paying a full-suite run.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]

    from open_molecule_data_pipeline_spark.registry import load_all
    from open_molecule_data_pipeline_spark.session import get_spark
    from tests._compare import assert_parity

    specs = load_all()
    unknown = [a for a in args if a not in specs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark(app_name="check-queries", master="local[8]", shuffle_partitions=8)
    failed = []
    for name in args:
        spec = specs[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, sf)
            if spec.oracle:
                assert_parity(df, spec.oracle, sf, name)
            else:
                df.collect()
            print(f"PASS {name} ({time.time() - t0:.2f}s)")
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: {exc}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
