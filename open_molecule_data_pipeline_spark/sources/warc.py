"""WARC (Web ARChive) source — the CommonCrawl ingestion format.

The reference pipeline mirrors chemistry archives and parses three formats
(SDF / delimited tables / JSON APIs — reference `ingestion/sdf.py`,
`ingestion/zinc.py`, `ingestion/common.py`); a *training-data* pipeline at
100 TB ingests web crawls, and the lingua franca there is WARC/1.0
(ISO 28500): a sequence of records, each a block of `Name: value` headers
terminated by a blank line, followed by exactly ``Content-Length`` payload
bytes and a ``\\r\\n\\r\\n`` separator. CommonCrawl ships every crawl as
~64-90k ``.warc.gz`` files of ~1 GB where **each record is its own gzip
member** — concatenated members form a valid gzip stream, which is what
makes per-record random access (and resumable partial fetches) possible
without a footer index.

Spark-first design:

- **File is the unit of parallelism.** A WARC file must be scanned
  sequentially (records are length-prefixed, not line-delimited, and the
  payload may contain anything — including bytes that look like record
  headers — so a naive ``lineSep`` split is incorrect). One crawl has tens
  of thousands of files, so ``spark.read.format("binaryFile")`` over the
  glob gives file-granular tasks that saturate a 1000-executor cluster;
  there is no intra-file parallelism to recover because gzip members are
  not individually addressable without an external index.
- **Arrow-batched parsing.** The parser runs inside ``mapInPandas`` — one
  Python invocation per batch of files, never per record row — and emits a
  typed DataFrame (record headers promoted to columns, HTTP payload split
  into status/headers/body for ``response`` records).
- **Record-type pushdown.** ``record_types=("response",)`` filters during
  the sequential scan, so warcinfo/request/metadata records never reach
  the Arrow boundary (a crawl is ~3 records per URL; responses are the
  only ones a corpus pipeline keeps).
- **Limits, stated:** ``binaryFile`` caps a single file at 2 GB (JVM byte
  array); CommonCrawl targets ~1 GB files so the cap holds with margin.
  Decompressed record payloads stream through Python one file at a time —
  peak memory is one decompressed file per core, the same bound the
  reference's streaming SDF parser has per archive.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("warc_date", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("body", StringType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(
    data: bytes,
    source_file: str = "",
    record_types: tuple[str, ...] | None = None,
) -> Iterator[dict]:
    """Parse one (decompressed) WARC stream into record dicts.

    Content-Length-driven, per the spec: payloads are consumed by byte
    count, never by delimiter search, so payload bytes that resemble WARC
    headers cannot desynchronize the scan.
    """
    if data[:2] == b"\x1f\x8b":  # gzip (multi-member streams included)
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    wanted = {t.lower() for t in record_types} if record_types else None
    while pos < n:
        # skip inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"{source_file or 'WARC stream'}: expected record header at "
                f"byte {pos}, found {data[pos : pos + 16]!r}"
            )
        header_end = data.find(_CRLF2, pos)
        if header_end < 0:
            raise ValueError(f"{source_file}: unterminated WARC header block")
        headers: dict[str, str] = {}
        header_lines = data[pos:header_end].decode("utf-8", "replace").split("\r\n")
        for line in header_lines[1:]:  # line 0 is the WARC/1.x version
            key, _, value = line.partition(":")
            headers[key.strip().lower()] = value.strip()
        length = int(headers.get("content-length", "0"))
        payload = data[header_end + 4 : header_end + 4 + length]
        pos = header_end + 4 + length
        rtype = headers.get("warc-type", "")
        if wanted is not None and rtype.lower() not in wanted:
            continue
        rec = {
            "source_file": source_file,
            "record_id": headers.get("warc-record-id"),
            "warc_type": rtype,
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_length": length,
            "http_status": None,
            "http_content_type": None,
            "body": None,
        }
        if payload.startswith(b"HTTP/"):
            http_end = payload.find(_CRLF2)
            if http_end < 0:
                http_end, body_bytes = len(payload), b""
            else:
                body_bytes = payload[http_end + 4 :]
            http_lines = payload[:http_end].decode("utf-8", "replace").split("\r\n")
            status_parts = http_lines[0].split(" ", 2)
            if len(status_parts) >= 2 and status_parts[1].isdigit():
                rec["http_status"] = int(status_parts[1])
            for line in http_lines[1:]:
                key, _, value = line.partition(":")
                if key.strip().lower() == "content-type":
                    rec["http_content_type"] = value.strip()
            rec["body"] = body_bytes.decode("utf-8", "replace")
        else:
            rec["body"] = payload.decode("utf-8", "replace")
        yield rec


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files into a typed DataFrame.

    ``binaryFile`` yields one row per file (path + content); parsing fans
    out file-per-task and stays Arrow-batched end to end.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                name = str(fpath).rsplit("/", 1)[-1]
                rows.extend(parse_warc_bytes(bytes(content), name, record_types))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def build_warc_gz(records: Iterable[dict]) -> bytes:
    """Serialize records as a spec-shaped multi-member ``.warc.gz`` blob.

    Each record becomes its own gzip member (the CommonCrawl layout). Used
    by tests and the ingest demo; also the shape a WARC *sink* would write.
    """
    members: list[bytes] = []
    for rec in records:
        if "http_status" in rec:
            body = rec.get("body", "").encode()
            payload = (
                f"HTTP/1.1 {rec['http_status']} OK\r\n"
                f"Content-Type: {rec.get('http_content_type', 'text/html')}\r\n"
                "\r\n"
            ).encode() + body
            rtype = "response"
        else:
            payload = rec.get("body", "").encode()
            rtype = rec.get("warc_type", "warcinfo")
        headers = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec.get('warc_type', rtype)}\r\n"
            f"WARC-Record-ID: <urn:uuid:{rec['record_id']}>\r\n"
            f"WARC-Date: {rec.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
            + (
                f"WARC-Target-URI: {rec['target_uri']}\r\n"
                if rec.get("target_uri")
                else ""
            )
            + f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        members.append(gzip.compress(headers + payload + b"\r\n\r\n"))
    return b"".join(members)


def warc_document_table(df: DataFrame) -> DataFrame:
    """Project parsed responses onto the corpus ``documents`` shape.

    The handoff from ingestion to the text/dedup operator ladder: one row
    per successful HTML response with the URL as provenance.
    """
    return (
        df.filter((F.col("warc_type") == "response") & (F.col("http_status") == 200))
        .select(
            F.col("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("body").alias("text"),
            F.length("body").alias("n_chars"),
        )
    )
