"""Property-based tests (hypothesis) for the parsing-heavy code paths —
rigor the reference's example-based suite lacks (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from open_molecule_data_pipeline_spark.sinks.report import human_bytes
from open_molecule_data_pipeline_spark.sources.http_api import extract_json_path
from open_molecule_data_pipeline_spark.sources.manifest import parse_manifest_lines
from open_molecule_data_pipeline_spark.sources.sdf import parse_sdf_block

_tag = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=20,
)
_value_line = st.text(
    alphabet=st.characters(blacklist_characters="\n>", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=40,
).map(lambda s: s.strip())


@given(st.dictionaries(_tag, st.lists(_value_line, min_size=1, max_size=3), max_size=8))
@settings(max_examples=200, deadline=None)
def test_sdf_block_roundtrip(props):
    """Rendering a property dict as an SDF block and parsing it back yields
    the same tags with newline-joined, stripped values."""
    lines = ["header", "M  END"]
    for tag, values in props.items():
        lines.append(f">  <{tag}>")
        lines.extend(values)
        lines.append("")
    parsed = parse_sdf_block("\n".join(lines))
    expected = {t: "\n".join(v).strip() for t, v in props.items()}
    assert parsed == expected


@given(
    st.lists(
        st.one_of(
            st.just(""),
            st.just("   "),
            st.from_regex(r"#[ -~]{0,30}", fullmatch=True),
            st.from_regex(r"https://h/[a-z0-9/]{1,30}(\.gz)?( [ -~]{0,10})?", fullmatch=True),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_manifest_parsing_properties(lines):
    urls = [
        line.strip().split()[0]
        for line in lines
        if line.strip() and not line.strip().startswith("#")
    ]
    if not urls:
        try:
            parse_manifest_lines(lines)
            raise AssertionError("expected ValueError on empty manifest")
        except ValueError:
            return
    entries = parse_manifest_lines(lines)
    assert [e["url"] for e in entries] == urls
    assert all(e["relative_path"] for e in entries)


@given(
    st.recursive(
        st.one_of(st.none(), st.integers(), st.text(max_size=5)),
        lambda child: st.dictionaries(st.text(max_size=5), child, max_size=4),
        max_leaves=20,
    ),
    st.lists(st.text(max_size=5), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_extract_json_path_never_raises(payload, path):
    result = extract_json_path(payload, path)
    # walking manually must agree
    cur = payload
    for key in path:
        if isinstance(cur, dict) and key in cur:
            cur = cur[key]
        else:
            cur = None
            break
    assert result == cur


@given(st.integers(min_value=0, max_value=2**50))
@settings(max_examples=300, deadline=None)
def test_human_bytes_total_function(n):
    s = human_bytes(n)
    assert any(s.endswith(u) for u in ("B", "KiB", "MiB", "GiB", "TiB"))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=50, deadline=None)
def test_zorder_interleave_invertible(pairs):
    """The Morton key emitted by the layout_zorder_key SQL fragment must be
    a true bit-interleave: deinterleaving recovers (x, y) exactly, and the
    key stays within 16 bits — run through DuckDB so the tested text is the
    same dialect the oracle uses."""
    import duckdb

    from open_molecule_data_pipeline_spark.operators.funcs_extra3 import _z_duck

    con = duckdb.connect()
    con.execute("CREATE TABLE pts (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pairs)
    rows = con.execute(f"SELECT x, y, {_z_duck('x', 'y')} FROM pts").fetchall()
    for x, y, z in rows:
        assert 0 <= z < 1 << 16
        rx = sum(((z >> (2 * k + 1)) & 1) << k for k in range(8))
        ry = sum(((z >> (2 * k)) & 1) << k for k in range(8))
        assert (rx, ry) == (x, y)


# --------------------------------------------------------------------------
# media codecs: encode∘decode must be the identity for every shape, channel
# count and PNG filter choice (incl. per-row mixed filters), and the AVI
# demux must return frame payloads byte-exactly for any frame list.
# --------------------------------------------------------------------------

_png_shape = st.tuples(
    st.integers(min_value=1, max_value=12),  # height
    st.integers(min_value=1, max_value=12),  # width
    st.sampled_from([1, 3, 4]),  # channels
)


@given(
    shape=_png_shape,
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filters=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
)
@settings(max_examples=150, deadline=None)
def test_png_roundtrip_property(shape, seed, filters):
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    h, w, ch = shape
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)
    dec = decode_png(encode_png(img, filters=filters))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert dec["width"] == w and dec["height"] == h and dec["channels"] == ch
    assert np.array_equal(dec["pixels"], ref)


@given(
    frames=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=12),
    dims=st.tuples(
        st.integers(min_value=1, max_value=4096),
        st.integers(min_value=1, max_value=4096),
    ),
)
@settings(max_examples=150, deadline=None)
def test_avi_demux_property(frames, dims):
    from open_molecule_data_pipeline_spark.operators.multimodal import (
        decode_avi,
        encode_avi,
    )

    w, h = dims
    dec = decode_avi(encode_avi(frames, width=w, height=h))
    assert dec["width"] == w and dec["height"] == h
    assert dec["n_frames"] == len(frames)
    assert dec["frames"] == [bytes(f) for f in frames]


# --- WARC round-trip ------------------------------------------------------

# bodies starting with "HTTP/" are excluded: the parser (like real WARC
# tooling) sniffs HTTP payloads by that prefix, so a metadata record whose
# body imitates an HTTP response is legitimately split as one
_warc_body = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    min_size=0,
    max_size=200,
).filter(lambda s: not s.startswith("HTTP/"))
_warc_uri = st.from_regex(r"https://[a-z]{1,10}\.example/[a-z0-9/]{0,20}", fullmatch=True)


@given(
    st.lists(
        st.tuples(_warc_body, _warc_uri, st.integers(100, 599), st.booleans()),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_warc_roundtrip(recs):
    """build_warc_gz -> parse_warc_bytes is the identity on (type, uri,
    status, body) for ARBITRARY bodies — including bodies containing
    record delimiters, fake WARC headers, or binary-ish text — because the
    scan is Content-Length-driven, never delimiter-driven."""
    from open_molecule_data_pipeline_spark.sources.warc import (
        build_warc_gz,
        parse_warc_bytes,
    )

    records = []
    for i, (body, uri, status, is_response) in enumerate(recs):
        if is_response:
            records.append(
                {"record_id": f"r{i}", "warc_type": "response",
                 "target_uri": uri, "http_status": status,
                 "http_content_type": "text/html", "body": body}
            )
        else:
            records.append(
                {"record_id": f"m{i}", "warc_type": "metadata",
                 "target_uri": uri, "body": body}
            )
    parsed = list(parse_warc_bytes(build_warc_gz(records), "prop.warc.gz"))
    assert len(parsed) == len(records)
    for rec, out in zip(records, parsed):
        assert out["warc_type"] == rec["warc_type"]
        assert out["target_uri"] == rec["target_uri"]
        # utf-8 round-trip: body survives byte-exactly for valid unicode
        assert out["body"] == rec["body"]
        if rec["warc_type"] == "response":
            assert out["http_status"] == rec["http_status"]
        else:
            assert out["http_status"] is None


def test_decimal_div_wraps_silently_under_ansi(spark):
    """Behavioral pin for ADVICE r8: Spark's decimal `div` returns
    LongType and WRAPS SILENTLY on int64 overflow — no ANSI abort. Every
    cast(... div ...) ppm idiom in the ML/eval family therefore relies on
    its quotient BOUNDS, not on a runtime backstop (see ml_eval.py). If a
    Spark upgrade ever makes this abort or widen, this pin fails and the
    headroom comments should be revisited (the bounds themselves stay
    correct either way)."""
    row = spark.sql(
        "SELECT cast(7e20 AS decimal(38,0)) div 3 AS q"
    ).collect()[0]
    # true quotient ~2.33e20 >> int64 max (9.22e18): the statement does
    # not raise, and the long that comes back is the two's-complement
    # wrap of the true quotient, not the quotient itself
    true_q = int(7e20) // 3
    assert row.q != true_q
    wrapped = (true_q + 2**63) % 2**64 - 2**63
    assert row.q == wrapped
