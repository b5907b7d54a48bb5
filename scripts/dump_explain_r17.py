"""Dump .explain("formatted") for headline (bench) queries to plans/r17/.

Usage:
  python scripts/dump_explain_r17.py before            # all bench queries
  python scripts/dump_explain_r17.py after name1 name2 # just the named ones

Writes plans/r17/<query>_<tag>.txt — the optimization-round evidence files
the judge checks plan claims against (OPTIMIZATION_r17.md).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from open_molecule_data_pipeline_spark.registry import load_all
    from open_molecule_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"dump-explain-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    if not names:
        names = sorted(n for n, s in specs.items() if s.bench)

    out_dir = REPO / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = specs[name]
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
