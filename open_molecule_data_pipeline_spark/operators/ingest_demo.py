"""Ingestion-surface demo queries with VALUES-literal oracles.

The fixtures are fixed, so every demo's expected output is a deterministic
literal — each oracle is a DuckDB ``VALUES`` table mirroring the golden rows
the pytest suite asserts, upgrading the driver check from rows-only to full
row/schema/hash parity.

The SDF / delimited-SMILES / NDJSON operators work on molecule archives,
not the driver's relational testdata, so these queries synthesize small
deterministic fixtures under a temp dir and run the real connectors on
them — giving the driver's smoke harness visibility into the §2A operator
surface (the pytest suite covers them in depth).
"""

from __future__ import annotations

import gzip
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from ..registry import register
from ..sources.sdf import read_sdf_records
from ..sources.smiles_table import read_smiles_table

_SDF_RECORD = """Demo
  -Engine-

M  END
>  <PUBCHEM_COMPOUND_CID>
CID{cid}

>  <PUBCHEM_OPENEYE_ISO_SMILES>
{smiles}

>  <PUBCHEM_IUPAC_NAME>
{name}

$$$$
"""

_DEMO_MOLS = [
    ("1", "C", "methane"),
    ("2", "CC", "ethane"),
    ("3", "CCC", "propane"),
    ("4", "CCCC", "butane"),
    ("5", "CC(=O)OC1=CC=CC=C1C(=O)O", "aspirin"),
]


_CHEMBL_RECORD = """Demo
  -Engine-

M  END
>  <ChEMBL_ID>
CHEMBL{cid}

>  <CANONICAL_SMILES>
{smiles}

$$$$
"""


def _fixture_dir() -> Path:
    root = Path(tempfile.gettempdir()) / "omdp_spark_demo_fixtures"
    root.mkdir(parents=True, exist_ok=True)
    sdf = root / "demo.sdf.gz"
    if not sdf.exists():
        body = "".join(
            _SDF_RECORD.format(cid=c, smiles=s, name=n) for c, s, n in _DEMO_MOLS
        )
        sdf.write_bytes(gzip.compress(body.encode()))
    tsv = root / "demo_tranche.txt"
    if not tsv.exists():
        tsv.write_text(
            "".join(f"{s}\tZINC{c.zfill(8)}\tbucket{c}\n" for c, s, _ in _DEMO_MOLS)
        )
    chembl = root / "demo_chembl.sdf.gz"
    if not chembl.exists():
        body = "".join(
            _CHEMBL_RECORD.format(cid=c, smiles=s) for c, s, _ in _DEMO_MOLS
        )
        chembl.write_bytes(gzip.compress(body.encode()))
    return root


_SDF_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('pubchem', 'CID1', 'C', 'PUBCHEM_IUPAC_NAME'),
  ('pubchem', 'CID2', 'CC', 'PUBCHEM_IUPAC_NAME'),
  ('pubchem', 'CID3', 'CCC', 'PUBCHEM_IUPAC_NAME'),
  ('pubchem', 'CID4', 'CCCC', 'PUBCHEM_IUPAC_NAME'),
  ('pubchem', 'CID5', 'CC(=O)OC1=CC=CC=C1C(=O)O', 'PUBCHEM_IUPAC_NAME')
) t(source, identifier, smiles, meta_keys)
"""


@register("ingest_sdf_demo", oracle=_SDF_DEMO_ORACLE, tags=("ingest", "sdf"))
def ingest_sdf_demo(spark, sf_dir):
    root = _fixture_dir()
    df = read_sdf_records(spark, str(root / "demo.sdf.gz"), source="pubchem")
    return df.select(
        "source",
        "identifier",
        "smiles",
        F.array_join(F.array_sort(F.map_keys("metadata")), ",").alias("meta_keys"),
    )


_SMILES_TABLE_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('zinc', 'ZINC00000001', 'C', 'bucket1'),
  ('zinc', 'ZINC00000002', 'CC', 'bucket2'),
  ('zinc', 'ZINC00000003', 'CCC', 'bucket3'),
  ('zinc', 'ZINC00000004', 'CCCC', 'bucket4'),
  ('zinc', 'ZINC00000005', 'CC(=O)OC1=CC=CC=C1C(=O)O', 'bucket5')
) t(source, identifier, smiles, bucket)
"""


@register(
    "ingest_smiles_table_demo",
    oracle=_SMILES_TABLE_DEMO_ORACLE,
    tags=("ingest", "smiles-table"),
)
def ingest_smiles_table_demo(spark, sf_dir):
    root = _fixture_dir()
    df = read_smiles_table(spark, str(root / "demo_tranche.txt"), source="zinc")
    return df.select(
        "source",
        "identifier",
        "smiles",
        F.element_at("metadata", "column_2").alias("bucket"),
    )


_CHEMBL_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('chembl', 'CHEMBL1', 'C'),
  ('chembl', 'CHEMBL2', 'CC'),
  ('chembl', 'CHEMBL3', 'CCC'),
  ('chembl', 'CHEMBL4', 'CCCC'),
  ('chembl', 'CHEMBL5', 'CC(=O)OC1=CC=CC=C1C(=O)O')
) t(source, identifier, smiles)
"""


@register(
    "ingest_chembl_demo",
    oracle=_CHEMBL_DEMO_ORACLE,
    tags=("ingest", "sdf", "chemistry"),
)
def ingest_chembl_demo(spark, sf_dir):
    """Named ``chembl`` connector preset: the registry type defaults the
    identifier/SMILES tags to ``ChEMBL_ID``/``CANONICAL_SMILES`` (reference
    ``ingestion/chembl.py:40-47``), so a YAML source needs only paths. The
    demo builds through ``CONNECTOR_REGISTRY`` with NO tag options — the
    preset itself is what's under test."""
    from ..plans.config import SourceDefinition
    from ..plans.runner import CONNECTOR_REGISTRY

    root = _fixture_dir()
    sdef = SourceDefinition(
        name="chembl",
        type="chembl",
        options={"paths": str(root / "demo_chembl.sdf.gz")},
    )
    df = CONNECTOR_REGISTRY[sdef.type](spark, sdef, {})
    return df.select("source", "identifier", "smiles")


_HTTP_PAGES = [
    {
        "results": [
            {"csid": 101, "smiles": "CCO", "inchi_key": "LFQSCWFLJHTTHZ", "formula": "C2H6O"},
            {"csid": 102, "smiles": "CCN", "inchi_key": "QUSNBJAOOMFDIB", "formula": "C2H7N"},
        ],
        "next": "1",
    },
    {
        "results": [
            {"csid": 103, "smiles": "CCC", "inchi_key": "ATUOYWHBWRKTHZ", "formula": "C3H8"}
        ],
        "next": None,
    },
]


def _demo_fetcher(url: str):
    """Deterministic in-memory ChemSpider-shaped API (cursor chain of 2 pages)."""
    idx = 0
    if "token=" in url:
        idx = int(url.split("token=")[1].split("&")[0])
    return _HTTP_PAGES[idx]


_HTTP_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('chemspider', '101', 'CCO', 'C2H6O'),
  ('chemspider', '102', 'CCN', 'C2H7N'),
  ('chemspider', '103', 'CCC', 'C3H8')
) t(source, identifier, smiles, formula)
"""


@register("ingest_http_demo", oracle=_HTTP_DEMO_ORACLE, tags=("ingest", "http"))
def ingest_http_demo(spark, sf_dir):
    from ..sources.http_api import chemspider_config, fetch_to_dataframe

    cfg = chemspider_config(name="chemspider")
    df = fetch_to_dataframe(spark, cfg, fetcher=_demo_fetcher)
    return df.select(
        "source",
        "identifier",
        "smiles",
        F.element_at("metadata", "formula").alias("formula"),
    )


_DESCRIPTORS_DEMO_ORACLE = """
SELECT identifier, smiles,
       cast(n_C AS INTEGER) AS n_C,
       cast(n_N AS INTEGER) AS n_N,
       cast(n_O AS INTEGER) AS n_O,
       cast(heavy_atoms AS INTEGER) AS heavy_atoms,
       cast(approx_mw AS DOUBLE) AS approx_mw,
       cast(ring_count AS INTEGER) AS ring_count,
       lipinski_mw_ok,
       cast(fp_bits_set AS INTEGER) AS fp_bits_set
FROM (VALUES
  ('CID1', 'C', 1, 0, 0, 1, 12.01, 0, TRUE, 0),
  ('CID2', 'CC', 2, 0, 0, 2, 24.02, 0, TRUE, 0),
  ('CID3', 'CCC', 3, 0, 0, 3, 36.03, 0, TRUE, 1),
  ('CID4', 'CCCC', 4, 0, 0, 4, 48.04, 0, TRUE, 1),
  ('CID5', 'CC(=O)OC1=CC=CC=C1C(=O)O', 9, 0, 4, 13, 172.1, 1, TRUE, 14)
) t(identifier, smiles, n_C, n_N, n_O, heavy_atoms, approx_mw, ring_count,
    lipinski_mw_ok, fp_bits_set)
"""


@register("molecule_descriptors_demo", oracle=_DESCRIPTORS_DEMO_ORACLE, tags=("chemistry",))
def molecule_descriptors_demo(spark, sf_dir):
    """Heuristic SMILES descriptors + fingerprint over the demo molecules;
    the fixture is fixed so the expected descriptor values are literals."""
    from ..functions.molecule import ngram_fingerprint, smiles_descriptors

    root = _fixture_dir()
    df = read_sdf_records(spark, str(root / "demo.sdf.gz"), source="pubchem")
    described = smiles_descriptors(df)
    return described.select(
        "identifier",
        "smiles",
        "n_C",
        "n_N",
        "n_O",
        "heavy_atoms",
        "approx_mw",
        "ring_count",
        "lipinski_mw_ok",
        F.size(ngram_fingerprint("smiles")).alias("fp_bits_set"),
    )


_HTTP_PYDS_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('api_a', 'a1', 'C', '1'),
  ('api_a', 'a2', 'CO', NULL),
  ('api_b', 'b1', 'N', NULL)
) t(source, identifier, smiles, w)
"""


@register(
    "ingest_http_pyds_demo",
    oracle=_HTTP_PYDS_DEMO_ORACLE,
    tags=("ingest", "http", "datasource"),
)
def ingest_http_pyds_demo(spark, sf_dir):
    """Spark 4 Python Data Source flavor of the HTTP connector — same
    surface as ``ingest_http_demo`` but read via
    ``spark.read.format("omdp_http")`` with one partition per source, so
    sources fetch in parallel on executors (rows-only: ingestion demo)."""
    from ..sources.http_api import HttpSourceConfig
    from ..sources.python_datasource import read_http_datasource

    cfgs = [
        HttpSourceConfig(name="api_a", base_url="https://h", endpoint="recs"),
        HttpSourceConfig(name="api_b", base_url="https://h", endpoint="recs"),
    ]
    pages = {
        "api_a": [
            {"records": [{"id": "a1", "smiles": "C", "w": 1}], "next": "t1"},
            {"records": [{"id": "a2", "smiles": "CO"}], "next": None},
        ],
        "api_b": [
            {"records": [{"id": "b1", "smiles": "N"}], "next": None},
        ],
    }
    df = read_http_datasource(spark, cfgs, pages=pages)
    return df.select(
        "source",
        "identifier",
        "smiles",
        F.element_at("metadata", "w").alias("w"),
    )


_HTTP_OFFSET_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('bulk', 'p0a', 'C'), ('bulk', 'p0b', 'O'),
  ('bulk', 'p1a', 'CC'),
  ('bulk', 'p2a', 'CO'), ('bulk', 'p2b', 'CN'),
  ('bulk', 'p3a', 'CCCC')
) t(source, identifier, smiles)
"""


@register(
    "ingest_http_offset_demo",
    oracle=_HTTP_OFFSET_DEMO_ORACLE,
    tags=("ingest", "http", "datasource"),
)
def ingest_http_offset_demo(spark, sf_dir):
    """OFFSET-paginated flavor of the Python Data Source connector: the
    page count is known up front, pages are independent, so ONE source
    fans out across executors as one partition per page range
    (pages_per_partition=2, total_pages=4 -> 2 partitions fetched in
    parallel) — the parallel path for a single giant endpoint that a
    cursor chain cannot take. Canned pages are indexed by the page number
    parsed from the URL, so results are order-independent."""
    from ..sources.http_api import HttpSourceConfig
    from ..sources.python_datasource import read_http_datasource

    cfg = HttpSourceConfig(
        name="bulk",
        base_url="https://h",
        endpoint="recs",
        pagination="offset",
        total_pages=4,
        pages_per_partition=2,
    )
    pages = {
        "bulk": [
            {"records": [{"id": "p0a", "smiles": "C"}, {"id": "p0b", "smiles": "O"}]},
            {"records": [{"id": "p1a", "smiles": "CC"}]},
            {"records": [{"id": "p2a", "smiles": "CO"}, {"id": "p2b", "smiles": "CN"}]},
            {"records": [{"id": "p3a", "smiles": "CCCC"}]},
        ]
    }
    df = read_http_datasource(spark, [cfg], pages=pages)
    return df.select("source", "identifier", "smiles")


_SDF_UDTF_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('PUBCHEM_COMPOUND_CID', 'CID1'), ('PUBCHEM_IUPAC_NAME', 'methane'),
  ('PUBCHEM_OPENEYE_ISO_SMILES', 'C'),
  ('PUBCHEM_COMPOUND_CID', 'CID2'), ('PUBCHEM_IUPAC_NAME', 'ethane'),
  ('PUBCHEM_OPENEYE_ISO_SMILES', 'CC'),
  ('PUBCHEM_COMPOUND_CID', 'CID3'), ('PUBCHEM_IUPAC_NAME', 'propane'),
  ('PUBCHEM_OPENEYE_ISO_SMILES', 'CCC'),
  ('PUBCHEM_COMPOUND_CID', 'CID4'), ('PUBCHEM_IUPAC_NAME', 'butane'),
  ('PUBCHEM_OPENEYE_ISO_SMILES', 'CCCC'),
  ('PUBCHEM_COMPOUND_CID', 'CID5'), ('PUBCHEM_IUPAC_NAME', 'aspirin'),
  ('PUBCHEM_OPENEYE_ISO_SMILES', 'CC(=O)OC1=CC=CC=C1C(=O)O')
) t(tag, value)
"""


@register(
    "ingest_sdf_udtf_demo", oracle=_SDF_UDTF_DEMO_ORACLE, tags=("ingest", "sdf", "udtf")
)
def ingest_sdf_udtf_demo(spark, sf_dir):
    """Spark 4 Python UDTF flavor of the SDF property explosion: one input
    row per ``$$$$`` block, LATERAL-joined to a table function that yields a
    (tag, value) row per property — the row-multiplying shape that scalar
    UDFs can't express (ref ``sdf.py:21-44`` semantics; the batch path in
    ``sources/sdf.py`` stays the Arrow-based production route)."""
    from pyspark.sql.functions import udtf

    from ..sources.sdf import parse_sdf_block

    @udtf(returnType="tag: string, value: string")
    class SdfTags:
        def eval(self, block: str):
            if block and block.strip():
                for tag, value in sorted(parse_sdf_block(block).items()):
                    yield tag, value

    root = _fixture_dir()
    spark.udtf.register("sdf_tags", SdfTags)
    blocks = spark.read.option("lineSep", "$$$$").text(str(root / "demo.sdf.gz"))
    blocks.createOrReplaceTempView("sdf_blocks")
    return spark.sql(
        "SELECT t.tag, t.value FROM sdf_blocks, LATERAL sdf_tags(value) t"
    )


_HTTP_STREAM_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('api_a', 'a1', 'C', '1'),
  ('api_a', 'a2', 'CO', NULL),
  ('api_b', 'b1', 'N', NULL)
) t(source, identifier, smiles, w)
"""


@register(
    "ingest_http_stream_demo",
    oracle=_HTTP_STREAM_DEMO_ORACLE,
    tags=("ingest", "http", "streaming"),
)
def ingest_http_stream_demo(spark, sf_dir):
    """STREAMING flavor of the Python Data Source connector: the paginated
    crawl runs as a Structured Streaming query — one page per source per
    micro-batch, offsets ({source: page}) checkpointed by the engine, so a
    restarted ingest resumes mid-crawl. Canned pages make it hermetic; the
    memory sink is drained to completion and compared to the VALUES oracle
    like the batch demos."""
    import tempfile
    import uuid

    from ..sources.http_api import HttpSourceConfig
    from ..sources.python_datasource import read_http_datasource_stream

    cfgs = [
        HttpSourceConfig(name="api_a", base_url="https://h", endpoint="recs"),
        HttpSourceConfig(name="api_b", base_url="https://h", endpoint="recs"),
    ]
    pages = {
        "api_a": [
            {"records": [{"id": "a1", "smiles": "C", "w": 1}], "next": "t1"},
            {"records": [{"id": "a2", "smiles": "CO"}], "next": None},
        ],
        "api_b": [
            {"records": [{"id": "b1", "smiles": "N"}], "next": None},
        ],
    }
    stream = read_http_datasource_stream(spark, cfgs, pages=pages)
    name = f"http_stream_demo_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix="omdp_http_stream_ck_")
    query = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        import shutil

        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name).select(
        "source",
        "identifier",
        "smiles",
        F.element_at("metadata", "w").alias("w"),
    )


_WARC_RESPONSES = [
    # (uuid, uri, status, content_type, body)
    ("aaaa-1", "https://example.com/a", 200, "text/html",
     "<html><body>alpha corpus page one</body></html>"),
    ("aaaa-2", "https://example.com/b", 200, "text/html",
     "<html><body>beta corpus page two</body></html>"),
    ("aaaa-3", "https://example.com/c", 404, "text/html",
     "<html><body>not found</body></html>"),
]


def _warc_fixture() -> "Path":
    """Deterministic multi-member .warc.gz: warcinfo + request + 3 responses."""
    from ..sources.warc import build_warc_gz

    root = Path(tempfile.gettempdir()) / "omdp_spark_demo_fixtures"
    root.mkdir(parents=True, exist_ok=True)
    path = root / "demo.warc.gz"
    if not path.exists():
        records = [
            {"record_id": "info-0", "warc_type": "warcinfo",
             "body": "software: omdp-spark-demo\r\nformat: WARC File Format 1.0"},
            {"record_id": "req-1", "warc_type": "request",
             "target_uri": "https://example.com/a",
             "body": "GET /a HTTP/1.1\r\nHost: example.com"},
        ] + [
            {"record_id": rid, "warc_type": "response", "target_uri": uri,
             "http_status": status, "http_content_type": ctype, "body": body}
            for rid, uri, status, ctype, body in _WARC_RESPONSES
        ]
        path.write_bytes(build_warc_gz(records))
    return path


_WARC_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('<urn:uuid:aaaa-1>', 'https://example.com/a',
   '<html><body>alpha corpus page one</body></html>', 47),
  ('<urn:uuid:aaaa-2>', 'https://example.com/b',
   '<html><body>beta corpus page two</body></html>', 46)
) t(doc_id, url, text, n_chars)
"""


@register("ingest_warc_demo", oracle=_WARC_DEMO_ORACLE, tags=("ingest", "warc"))
def ingest_warc_demo(spark, sf_dir):
    """CommonCrawl-shaped WARC ingestion: multi-member .warc.gz ->
    Content-Length-driven record scan (``sources/warc.py``) -> HTTP
    status/header split -> corpus ``documents`` projection. Record-type
    pushdown keeps warcinfo/request records out of the Arrow boundary, and
    the 404 response is dropped by the documents projection — only the two
    200-status pages survive."""
    from ..sources.warc import read_warc, warc_document_table

    path = _warc_fixture()
    df = read_warc(spark, str(path), record_types=("response",))
    return warc_document_table(df).orderBy("doc_id")


_ARROW_DEMO_ORACLE = """
SELECT * FROM (VALUES
  (1, 'C', 16.04), (2, 'CC', 30.07), (3, 'CCO', 46.07),
  (4, 'CCN', 45.08), (5, 'CCC', 44.1)
) t(mol_id, smiles, mw)
"""


@register("ingest_arrow_demo", oracle=_ARROW_DEMO_ORACLE, tags=("ingest", "formats"))
def ingest_arrow_demo(spark, sf_dir):
    """Arrow IPC (Feather v2) ingestion: the standard hand-off artifact of
    Python feature pipelines read file-per-task through pyarrow inside
    mapInPandas (``sources/formats.py::read_arrow_ipc``)."""
    import pyarrow as pa
    import pyarrow.ipc

    from pyspark.sql import types as T

    from ..sources.formats import read_arrow_ipc

    root = Path(tempfile.gettempdir()) / "omdp_spark_demo_fixtures"
    root.mkdir(parents=True, exist_ok=True)
    path = root / "demo.arrow"
    if not path.exists():
        tbl = pa.table(
            {
                "mol_id": pa.array([1, 2, 3, 4, 5], pa.int32()),
                "smiles": ["C", "CC", "CCO", "CCN", "CCC"],
                "mw": pa.array([16.04, 30.07, 46.07, 45.08, 44.1], pa.float64()),
            }
        )
        with pa.ipc.new_file(str(path), tbl.schema) as w:
            w.write_table(tbl)
    schema = T.StructType(
        [
            T.StructField("mol_id", T.IntegerType()),
            T.StructField("smiles", T.StringType()),
            T.StructField("mw", T.DoubleType()),
        ]
    )
    return read_arrow_ipc(spark, str(path), schema)


# --------------------------------------------------------------------------
# Python Data Source WRITER demo (r10): the reference's gzip-NDJSON batch
# sink (reference pipeline/io.py) exposed as a first-class
# ``df.write.format("omdp_ndjson")`` target — two-phase staged-rename
# commit, per-task files, _SUCCESS manifest with row counts
# (sinks/python_datasource_sink.py). The contract query round-trips a
# deterministic molecule batch through the sink and reads the gzip files
# back with Spark's JSON reader, returning the rows PLUS the manifest
# total — so the driver hash proves payload fidelity AND that the commit
# protocol accounted for every row.
# --------------------------------------------------------------------------

_NDJSON_SINK_DEMO_ORACLE = """
SELECT * FROM (VALUES
  ('CID1', 'CCO', 3),
  ('CID2', 'Cc1ccccc1', 3),
  ('CID3', 'CC(N)O', 3)
) t(identifier, smiles, manifest_rows)
"""


@register(
    "ingest_ndjson_pyds_sink_demo",
    oracle=_NDJSON_SINK_DEMO_ORACLE,
    tags=("ingest", "datasource", "formats"),
)
def ingest_ndjson_pyds_sink_demo(spark, sf_dir):
    import json as _json
    from pathlib import Path

    from ..sinks.python_datasource_sink import register_ndjson_sink
    from .file_formats import _scratch

    register_ndjson_sink(spark)
    rows = [("CID1", "CCO"), ("CID2", "Cc1ccccc1"), ("CID3", "CC(N)O")]
    df = spark.createDataFrame(rows, "identifier string, smiles string")
    out = _scratch("pyds_ndjson", sf_dir)
    # overwrite mode (r11): exercises the commit-time stale-file sweep —
    # the second write below must leave data files == manifest exactly.
    for _ in range(2):
        (
            df.coalesce(2)
            .write.format("omdp_ndjson")
            .option("path", str(out))
            .mode("overwrite")
            .save()
        )
    manifest = _json.loads((Path(str(out)) / "_SUCCESS").read_text())
    total = sum(manifest.values())
    back = spark.read.json(f"{out}/*.ndjson.gz")
    return back.select(
        "identifier", "smiles", F.lit(total).cast("int").alias("manifest_rows")
    )
