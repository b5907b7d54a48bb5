"""Source connector tests — same fixtures/technique as the reference's unit
suite (synthetic gzip SDF, TSV tranches, manifests, fake HTTP fetchers)."""

from __future__ import annotations

import gzip
import json

import pytest

from open_molecule_data_pipeline_spark.sources.http_api import (
    HttpSourceConfig,
    chemspider_config,
    extract_json_path,
    fetch_pages,
    fetch_to_dataframe,
)
from open_molecule_data_pipeline_spark.sources.manifest import (
    checksum_sidecar_url,
    parse_checksum_sidecar,
    read_manifest,
    read_manifest_df,
)
from open_molecule_data_pipeline_spark.sources.sdf import (
    parse_sdf_block,
    read_sdf,
    read_sdf_records,
)
from open_molecule_data_pipeline_spark.sources.smiles_table import read_smiles_table

SDF_RECORD = """PubChem
  -OEChem-

  0  0  0  0  0  0  0  0  0
M  END
>  <PUBCHEM_COMPOUND_CID>
CID{cid}

>  <PUBCHEM_OPENEYE_ISO_SMILES>
{smiles}

>  <PUBCHEM_IUPAC_NAME>
{name}

$$$$
"""


def _write_sdf(path, records, compress=True):
    body = "".join(
        SDF_RECORD.format(cid=cid, smiles=smi, name=name)
        for cid, smi, name in records
    )
    data = body.encode()
    if compress:
        path.write_bytes(gzip.compress(data))
    else:
        path.write_bytes(data)
    return path


def test_parse_sdf_block_multiline_value():
    block = (
        "header\nM  END\n"
        "> <TAG_A>\nline1\nline2\n\n"
        ">  <TAG_B>  (extra)\nvalue\n"
    )
    props = parse_sdf_block(block)
    assert props == {"TAG_A": "line1\nline2", "TAG_B": "value"}


def test_read_sdf_gzip(spark, tmp_path):
    _write_sdf(
        tmp_path / "chunk_a.sdf.gz",
        [("1", "C", "methane"), ("2", "CC", "ethane"), ("3", "CCC", "propane")],
    )
    parsed = read_sdf(spark, str(tmp_path / "chunk_a.sdf.gz"))
    rows = parsed.collect()
    assert len(rows) == 3
    by_cid = {r.props["PUBCHEM_COMPOUND_CID"]: r.props for r in rows}
    assert by_cid["CID2"]["PUBCHEM_OPENEYE_ISO_SMILES"] == "CC"
    assert by_cid["CID3"]["PUBCHEM_IUPAC_NAME"] == "propane"
    assert all(r.source_file.endswith("chunk_a.sdf.gz") for r in rows)


def test_read_sdf_records_normalization(spark, tmp_path):
    _write_sdf(tmp_path / "a.sdf.gz", [("1", "C", "methane"), ("2", "CC", "")])
    df = read_sdf_records(spark, str(tmp_path / "a.sdf.gz"), source="pubchem")
    rows = {r.identifier: r for r in df.collect()}
    assert set(rows) == {"CID1", "CID2"}
    assert rows["CID1"].smiles == "C"
    assert rows["CID1"].source == "pubchem"
    assert rows["CID1"].metadata == {"PUBCHEM_IUPAC_NAME": "methane"}
    # empty metadata values are dropped (reference pubchem.py:234)
    assert rows["CID2"].metadata == {}


def test_read_sdf_records_chembl_tags(spark, tmp_path):
    body = (
        "mol\nM  END\n> <ChEMBL_ID>\nCHEMBL25\n\n"
        "> <CANONICAL_SMILES>\nCC(=O)Oc1ccccc1C(=O)O\n\n$$$$\n"
    )
    (tmp_path / "chembl.sdf").write_bytes(body.encode())
    df = read_sdf_records(
        spark,
        str(tmp_path / "chembl.sdf"),
        source="chembl",
        identifier_tag="ChEMBL_ID",
        smiles_tag="CANONICAL_SMILES",
    )
    row = df.collect()[0]
    assert row.identifier == "CHEMBL25"
    assert row.smiles.startswith("CC(=O)")


def test_smiles_table_mapping_and_malformed(spark, tmp_path):
    content = "C\tZINC01\textra1\nCC\tZINC02\n\nBADLINE\n\tZINC03\nCCC\tZINC04\n"
    (tmp_path / "AAAA.txt").write_text(content)
    df = read_smiles_table(spark, str(tmp_path / "AAAA.txt"), source="zinc")
    rows = {r.identifier: r for r in df.collect()}
    # BADLINE (1 col), blank line, and empty-smiles line are all skipped
    assert set(rows) == {"ZINC01", "ZINC02", "ZINC04"}
    assert rows["ZINC01"].smiles == "C"
    assert rows["ZINC01"].metadata["column_2"] == "extra1"
    assert rows["ZINC01"].metadata["source_file"].endswith("AAAA.txt")
    assert "column_2" not in rows["ZINC02"].metadata


def test_smiles_table_gzip_and_columns(spark, tmp_path):
    (tmp_path / "B.txt.gz").write_bytes(gzip.compress(b"ZINC9 CCO\n"))
    df = read_smiles_table(
        spark,
        str(tmp_path / "B.txt.gz"),
        source="zinc",
        delimiter=None,
        smiles_column=1,
        identifier_column=0,
    )
    row = df.collect()[0]
    assert (row.identifier, row.smiles) == ("ZINC9", "CCO")


def test_manifest_parsing(tmp_path):
    (tmp_path / "links.txt").write_text(
        "# comment\n\n"
        "https://host/path/Compound_001.sdf.gz md5sum-ignored\n"
        "https://host/2D/AA/AAAA.txt\n"
    )
    flat = read_manifest(tmp_path / "links.txt")
    assert [e["relative_path"] for e in flat] == ["Compound_001.sdf.gz", "AAAA.txt"]
    deep = read_manifest(tmp_path / "links.txt", preserve_path=True)
    assert deep[1]["relative_path"] == "2D/AA/AAAA.txt"


def test_manifest_empty_raises(tmp_path):
    (tmp_path / "empty.txt").write_text("# only comments\n\n")
    with pytest.raises(ValueError):
        read_manifest(tmp_path / "empty.txt")


def test_manifest_df(spark, tmp_path):
    (tmp_path / "links.txt").write_text(
        "# c\nhttps://host/a/b.sdf.gz\nhttps://host/c/d.txt token\n"
    )
    rows = read_manifest_df(spark, str(tmp_path / "links.txt")).collect()
    assert [r.relative_path for r in rows] == ["b.sdf.gz", "d.txt"]
    deep = read_manifest_df(
        spark, str(tmp_path / "links.txt"), preserve_path=True
    ).collect()
    assert deep[0].relative_path == "a/b.sdf.gz"


def test_checksum_sidecar():
    assert checksum_sidecar_url("https://h/x.sdf.gz") == "https://h/x.sdf.gz.md5"
    assert parse_checksum_sidecar("abc123  x.sdf.gz\n") == "abc123"
    assert parse_checksum_sidecar("") is None


def test_extract_json_path():
    payload = {"a": {"b": [1]}, "next": None}
    assert extract_json_path(payload, ["a", "b"]) == [1]
    assert extract_json_path(payload, ["a", "missing"]) is None


def _paged_fetcher(pages):
    """Fake fetcher emulating a cursor-paginated API."""
    def fetch(url):
        if "token=" in url:
            token = url.split("token=")[1].split("&")[0]
            idx = int(token)
        else:
            idx = 0
        return pages[idx]

    return fetch


def test_http_fetch_pages_cursor_chain():
    pages = [
        {"results": [{"csid": 1, "smiles": "C", "formula": "CH4"}], "next": "1"},
        {"results": [{"csid": 2, "smiles": "CC", "inchi_key": "K2"}], "next": None},
    ]
    cfg = chemspider_config()
    out = list(fetch_pages(cfg, fetcher=_paged_fetcher(pages)))
    assert len(out) == 2
    (recs1, cur1), (recs2, cur2) = out
    assert recs1[0][1] == "1" and cur1 == {"token": "1"}
    assert recs2[0][2] == "CC" and cur2 is None
    # metadata whitelist from the chemspider preset
    assert recs1[0][3] == {"formula": "CH4"}


def test_http_to_dataframe(spark):
    pages = [
        {"records": [{"id": "a", "smiles": "C", "x": 1}], "next": {"cursor": "n"}},
        {"records": [{"id": "b", "smiles": "N", "x": ""}], "next": None},
    ]
    calls = []

    def fetch(url):
        calls.append(url)
        return pages[len(calls) - 1]

    cfg = HttpSourceConfig(name="api", base_url="https://h", endpoint="recs")
    df = fetch_to_dataframe(spark, cfg, fetcher=fetch)
    rows = {r.identifier: r for r in df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"].metadata == {"x": "1"}
    assert rows["b"].metadata == {}  # empty values dropped
    assert "cursor=n" in calls[1]


def test_http_retry_backoff(monkeypatch):
    cfg = HttpSourceConfig(
        name="api", base_url="https://h", endpoint="r", backoff_base=0.0
    )
    attempts = []

    def flaky(url):
        attempts.append(url)
        if len(attempts) < 3:
            raise ConnectionError("boom")
        return {"records": [], "next": None}

    out = list(fetch_pages(cfg, fetcher=flaky))
    assert len(attempts) == 3 and out[0][0] == []


def test_http_json_roundtrip_types():
    # identifiers/smiles str()-coerced like the reference (common.py:190-196)
    cfg = HttpSourceConfig(name="api", base_url="https://h", endpoint="r")
    page = {"records": [{"id": 7, "smiles": 42, "z": {"deep": 1}}], "next": None}
    (recs, _), = fetch_pages(cfg, fetcher=lambda url: page)
    assert recs[0][1] == "7" and recs[0][2] == "42"
    assert json.loads(recs[0][3]["z"].replace("'", '"')) == {"deep": 1}


def test_read_sdf_crlf_and_no_trailing_newline(spark, tmp_path):
    """CRLF line endings and a final record without trailing newline parse
    identically to the tolerant reference splitter."""
    body = (
        "mol\r\nM  END\r\n>  <PUBCHEM_COMPOUND_CID>\r\nCID1\r\n\r\n"
        ">  <PUBCHEM_OPENEYE_ISO_SMILES>\r\nC\r\n\r\n$$$$\r\n"
        "mol\r\nM  END\r\n>  <PUBCHEM_COMPOUND_CID>\r\nCID2\r\n\r\n"
        ">  <PUBCHEM_OPENEYE_ISO_SMILES>\r\nCC\r\n\r\n$$$$"  # no trailing newline
    )
    (tmp_path / "crlf.sdf").write_bytes(body.encode())
    df = read_sdf_records(spark, str(tmp_path / "crlf.sdf"), source="pubchem")
    rows = {r.identifier: r.smiles for r in df.collect()}
    assert rows == {"CID1": "C", "CID2": "CC"}


def test_http_parse_records_skips_malformed():
    cfg = HttpSourceConfig(name="api", base_url="https://h", endpoint="r")
    page = {
        "records": [None, "junk", {"id": "ok", "smiles": "C"}],
        "next": None,
    }
    (recs, _), = fetch_pages(cfg, fetcher=lambda url: page)
    assert [r[1] for r in recs] == ["ok"]
    # records_path resolving to a non-list is tolerated too
    (recs2, _), = fetch_pages(
        cfg, fetcher=lambda url: {"records": {"not": "a list"}, "next": None}
    )
    assert recs2 == []


def test_chemspider_config_rejects_unknown_option():
    with pytest.raises(TypeError, match="cursor_params"):
        chemspider_config(cursor_params="token")


def test_manifest_df_trailing_slash_surrogate(spark, tmp_path):
    (tmp_path / "links.txt").write_text("https://host/\nHTTPS://host/A/b.gz\n")
    rows = read_manifest_df(spark, str(tmp_path / "links.txt")).collect()
    assert rows[0].relative_path and "/" not in rows[0].relative_path
    assert rows[1].relative_path == "b.gz"
    deep = read_manifest_df(
        spark, str(tmp_path / "links.txt"), preserve_path=True
    ).collect()
    assert deep[1].relative_path == "A/b.gz"  # uppercase scheme stripped


def test_python_datasource_http(spark):
    """Spark 4 Python Data Source flavor: two sources -> two partitions,
    cursor chains replayed from canned pages on the executors."""
    from open_molecule_data_pipeline_spark.sources.python_datasource import (
        read_http_datasource,
    )

    cfg_a = HttpSourceConfig(name="src_a", base_url="https://h", endpoint="recs")
    cfg_b = HttpSourceConfig(name="src_b", base_url="https://h", endpoint="recs")
    pages = {
        "src_a": [
            {"records": [{"id": "a1", "smiles": "C", "x": 1}], "next": "t2"},
            {"records": [{"id": "a2", "smiles": "CC"}], "next": None},
        ],
        "src_b": [
            {"records": [{"id": "b1", "smiles": "O"}], "next": None},
        ],
    }
    df = read_http_datasource(spark, [cfg_a, cfg_b], pages=pages)
    assert df.rdd.getNumPartitions() == 2
    rows = {r.identifier: r for r in df.collect()}
    assert set(rows) == {"a1", "a2", "b1"}
    assert rows["a1"].source == "src_a"
    assert rows["a1"].metadata == {"x": "1"}
    assert rows["b1"].source == "src_b"


def test_python_datasource_offset_pagination(spark):
    """Offset-paginated source: pages are independent, so ONE source fans
    out as one partition per page range — and mixes freely with a cursor
    source (which stays single-partition)."""
    from open_molecule_data_pipeline_spark.sources.python_datasource import (
        read_http_datasource,
    )

    bulk = HttpSourceConfig(
        name="bulk",
        base_url="https://h",
        endpoint="recs",
        pagination="offset",
        total_pages=5,
        pages_per_partition=2,
    )
    chain = HttpSourceConfig(name="chain", base_url="https://h", endpoint="recs")
    pages = {
        "bulk": [
            {"records": [{"id": f"p{i}", "smiles": "C" * (i + 1)}]}
            for i in range(5)
        ],
        "chain": [{"records": [{"id": "c1", "smiles": "O"}], "next": None}],
    }
    df = read_http_datasource(spark, [bulk, chain], pages=pages)
    # ceil(5/2)=3 offset partitions + 1 cursor partition
    assert df.rdd.getNumPartitions() == 4
    rows = {r.identifier: r.source for r in df.collect()}
    assert rows == {f"p{i}": "bulk" for i in range(5)} | {"c1": "chain"}


def test_smiles_table_leading_whitespace(spark, tmp_path):
    """ADVICE r1: delimiter=None must match str.split() — leading
    whitespace is discarded, not parsed as an empty first column."""
    p = tmp_path / "tranche.txt"
    p.write_text("  CCO ZINC1 x\n\tCCN ZINC2 y\nCCC ZINC3 z\n")
    from open_molecule_data_pipeline_spark.sources.smiles_table import (
        read_smiles_table,
    )

    df = read_smiles_table(spark, str(p), delimiter=None)
    rows = {r.identifier: r.smiles for r in df.collect()}
    assert rows == {"ZINC1": "CCO", "ZINC2": "CCN", "ZINC3": "CCC"}


def test_python_datasource_retry_backoff(spark):
    """VERDICT r1 #9: executor-side fetches go through the same
    exponential-backoff retry policy as the driver pump — two injected
    transient failures are absorbed, the page still arrives."""
    from open_molecule_data_pipeline_spark.sources.python_datasource import (
        read_http_datasource,
    )

    cfg = HttpSourceConfig(
        name="flaky",
        base_url="https://h",
        endpoint="recs",
        backoff_base=0.01,  # keep the test fast; policy shape is unchanged
        backoff_cap=0.02,
    )
    pages = {"flaky": [{"records": [{"id": "f1", "smiles": "C"}], "next": None}]}
    df = read_http_datasource(spark, [cfg], pages=pages, fail_first=2)
    rows = df.collect()
    assert [r.identifier for r in rows] == ["f1"]


def test_python_datasource_retry_exhaustion(spark):
    """More failures than max_retries must surface, not loop forever."""
    import pytest

    from open_molecule_data_pipeline_spark.sources.python_datasource import (
        read_http_datasource,
    )

    cfg = HttpSourceConfig(
        name="dead",
        base_url="https://h",
        endpoint="recs",
        max_retries=2,
        backoff_base=0.01,
        backoff_cap=0.02,
    )
    pages = {"dead": [{"records": [], "next": None}]}
    df = read_http_datasource(spark, [cfg], pages=pages, fail_first=5)
    with pytest.raises(Exception, match="injected transient failure"):
        df.collect()


def test_python_datasource_streaming_pages(spark, tmp_path):
    """Streaming flavor of the PyDS connector: one page per source per
    micro-batch, offsets checkpointed as {source: page}; draining the
    canned pages yields exactly the batch reader's rows."""
    from open_molecule_data_pipeline_spark.sources.python_datasource import (
        read_http_datasource_stream,
    )

    cfg_a = HttpSourceConfig(name="src_a", base_url="https://h", endpoint="recs")
    cfg_b = HttpSourceConfig(name="src_b", base_url="https://h", endpoint="recs")
    pages = {
        "src_a": [
            {"records": [{"id": "a1", "smiles": "C", "x": 1}], "next": "t2"},
            {"records": [{"id": "a2", "smiles": "CC"}], "next": None},
        ],
        "src_b": [
            {"records": [{"id": "b1", "smiles": "O"}], "next": None},
        ],
    }
    stream = read_http_datasource_stream(spark, [cfg_a, cfg_b], pages=pages)
    assert stream.isStreaming
    name = "pyds_stream_sink"
    # default micro-batch trigger: the engine keeps calling read() until
    # offsets stop advancing (availableNow is not supported by Python
    # stream sources — the engine logs a single-batch fallback for it)
    query = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    rows = {r.identifier: r for r in spark.table(name).collect()}
    assert set(rows) == {"a1", "a2", "b1"}
    assert rows["a1"].source == "src_a"
    assert rows["a1"].metadata == {"x": "1"}
    # src_a needed two micro-batches (one page each): offsets advanced past
    # batch 0, proving the incremental page-per-batch read path
    assert query.lastProgress["batchId"] >= 1

    # offset semantics at the reader level (what checkpoint recovery
    # replays): one page per source per read(), exhaustion is a fixpoint,
    # and readBetweenOffsets reproduces a batch exactly
    import json as _json

    from open_molecule_data_pipeline_spark.sources.python_datasource import (
        HttpApiStreamReader,
    )
    from dataclasses import asdict

    reader = HttpApiStreamReader(
        {
            "configs": _json.dumps([asdict(cfg_a), asdict(cfg_b)]),
            "pages": _json.dumps(pages),
        }
    )
    o0 = reader.initialOffset()
    rows1, o1 = reader.read(o0)
    rows1 = list(rows1)
    assert o1 == {"src_a": 1, "src_b": 1}
    rows2, o2 = reader.read(o1)
    assert [r[1] for r in rows2] == ["a2"]  # only src_a had a second page
    assert o2 == {"src_a": 2, "src_b": 1}
    _, o3 = reader.read(o2)
    assert o3 == o2  # drained: offsets are a fixpoint
    replay = list(reader.readBetweenOffsets(o0, o1))
    assert sorted(r[1] for r in replay) == sorted(r[1] for r in rows1)


def test_warc_parser_content_length_driven():
    """Payload bytes that LOOK like WARC headers must not desync the scan —
    the Content-Length-driven parser is what makes naive lineSep splits
    incorrect (and this parser correct)."""
    from open_molecule_data_pipeline_spark.sources.warc import (
        build_warc_gz,
        parse_warc_bytes,
    )

    trap_body = "<html>WARC/1.0\r\nWARC-Type: fake\r\n\r\ntrap</html>"
    records = [
        {"record_id": "info-0", "warc_type": "warcinfo", "body": "software: t"},
        {"record_id": "r1", "warc_type": "response",
         "target_uri": "https://e.com/a", "http_status": 200,
         "http_content_type": "text/html", "body": trap_body},
        {"record_id": "r2", "warc_type": "response",
         "target_uri": "https://e.com/b", "http_status": 404,
         "http_content_type": "text/plain", "body": "gone"},
    ]
    blob = build_warc_gz(records)
    # multi-member gzip: each record its own member (CommonCrawl layout)
    assert blob.count(b"\x1f\x8b\x08") >= 3
    parsed = list(parse_warc_bytes(blob, "t.warc.gz"))
    assert [r["warc_type"] for r in parsed] == ["warcinfo", "response", "response"]
    assert parsed[1]["body"] == trap_body  # fake header survived intact
    assert parsed[1]["http_status"] == 200
    assert parsed[2]["http_status"] == 404
    # record-type pushdown drops non-responses during the sequential scan
    only_resp = list(parse_warc_bytes(blob, "t", record_types=("response",)))
    assert [r["record_id"] for r in only_resp] == ["<urn:uuid:r1>", "<urn:uuid:r2>"]


def test_warc_spark_read_and_document_projection(spark, tmp_path):
    from open_molecule_data_pipeline_spark.sources.warc import (
        build_warc_gz,
        read_warc,
        warc_document_table,
    )

    records = [
        {"record_id": "req-1", "warc_type": "request",
         "target_uri": "https://e.com/a", "body": "GET /a HTTP/1.1"},
        {"record_id": "ok-1", "warc_type": "response",
         "target_uri": "https://e.com/a", "http_status": 200,
         "http_content_type": "text/html", "body": "<html>alpha</html>"},
        {"record_id": "nf-1", "warc_type": "response",
         "target_uri": "https://e.com/x", "http_status": 404,
         "http_content_type": "text/html", "body": "<html>gone</html>"},
    ]
    # two files -> two binaryFile rows -> file-granular parallel parse
    (tmp_path / "part-0.warc.gz").write_bytes(build_warc_gz(records))
    (tmp_path / "part-1.warc.gz").write_bytes(
        build_warc_gz(
            [{"record_id": "ok-2", "warc_type": "response",
              "target_uri": "https://e.com/b", "http_status": 200,
              "http_content_type": "text/html", "body": "<html>beta</html>"}]
        )
    )
    df = read_warc(spark, str(tmp_path / "*.warc.gz"), record_types=("response",))
    rows = {r["record_id"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"<urn:uuid:ok-1>", "<urn:uuid:nf-1>", "<urn:uuid:ok-2>"}
    assert rows["<urn:uuid:ok-1>"]["http_content_type"] == "text/html"
    assert rows["<urn:uuid:ok-1>"]["source_file"] == "part-0.warc.gz"

    docs = warc_document_table(df).collect()
    assert sorted((d["url"], d["text"]) for d in docs) == [
        ("https://e.com/a", "<html>alpha</html>"),
        ("https://e.com/b", "<html>beta</html>"),
    ]
    assert all(d["n_chars"] == len(d["text"]) for d in docs)
