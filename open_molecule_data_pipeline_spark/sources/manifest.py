"""Manifest (URL link file) parsing.

Parity with the reference's per-connector manifest readers (reference
``pubchem.py:104-143``, ``chembl.py:86-102``, ``zinc.py:110-136``): skip
blank lines and ``#`` comments, take the first whitespace token as the URL,
derive either the basename (PubChem/ChEMBL) or the URL-path-preserving
relative path (ZINC). Manifests are small (353-1,916 lines), so a
driver-side parse is the right tool; a DataFrame variant is provided for
symmetry and for fleets of manifests.
"""

from __future__ import annotations

from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_manifest_lines(lines: list[str], *, preserve_path: bool = False) -> list[dict]:
    entries: list[dict] = []
    for line in lines:
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        url = stripped.split()[0]
        path = urlparse(url).path
        rel = path.lstrip("/") if preserve_path else Path(path).name
        if not rel:
            # trailing-slash / pathless URL: a deterministic surrogate name
            # instead of silently targeting the destination root
            import hashlib

            rel = hashlib.md5(url.encode()).hexdigest()[:12]
        entries.append({"url": url, "relative_path": rel})
    if not entries:
        raise ValueError("manifest contains no URLs")
    return entries


def read_manifest(path: str | Path, *, preserve_path: bool = False) -> list[dict]:
    text = Path(path).read_text(encoding="utf-8")
    return parse_manifest_lines(text.splitlines(), preserve_path=preserve_path)


def read_manifest_df(
    spark: SparkSession, path: str, *, preserve_path: bool = False
) -> DataFrame:
    """DataFrame flavor: filter comments/blanks, split first token."""
    url = F.split(F.trim("value"), r"\s+")[0]
    rel = (
        F.regexp_replace(
            F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/", ""),
            r"\?.*$",
            "",
        )
        if preserve_path
        else F.regexp_extract(url, r"([^/?]+)(?:\?.*)?$", 1)
    )
    # same surrogate-name fallback as parse_manifest_lines: a pathless /
    # trailing-slash URL must not resolve to the destination root
    rel = F.coalesce(F.nullif(rel, F.lit("")), F.substring(F.md5(url), 1, 12))
    return (
        spark.read.text(path)
        .filter((F.trim("value") != "") & ~F.trim("value").startswith("#"))
        .select(url.alias("url"), rel.alias("relative_path"))
    )


def checksum_sidecar_url(url: str) -> str:
    """PubChem checksum sidecar = same URL + '.md5' (reference
    ``pubchem.py:145-151``)."""
    return url + ".md5"


def parse_checksum_sidecar(text: str) -> str | None:
    """First whitespace token of the sidecar body is the hex digest
    (reference ``pubchem.py:161-165``)."""
    tokens = text.split()
    return tokens[0] if tokens else None
