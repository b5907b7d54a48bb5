"""Phonetic matching: Spark's built-in ``soundex`` vs a from-scratch SQL
implementation of the algorithm as the oracle.

Unlike most scalar functions, DuckDB has no soundex — so the oracle
IMPLEMENTS American Soundex in set-based SQL (letter → digit translate,
adjacent-duplicate collapse via a lag window over the exploded character
stream, vowel removal, pad to 4). Agreement is therefore a real spec
check of Spark's native function on the corpus vocabulary, including the
phonetic collisions it exists to produce (red/rod → R300). The vocabulary
is the distinct token set (Heaps-small), so both sides do the per-word
work once and the fact-side cost is a broadcast lookup — the standard
shape for phonetic blocking in record linkage at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# classic Soundex letter codes, A..Z (H/W/Y and vowels -> 0, dropped later)
_SOUNDEX_MAP = "01230120022455012623010202"

_SOUNDEX_ORACLE = f"""
WITH words AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
  UNION
  SELECT DISTINCT lower(c_mktsegment) FROM customer
),
norm AS (
  SELECT w,
         regexp_replace(upper(w), '[^A-Z]', '', 'g') AS u
  FROM words
),
mapped AS (
  SELECT w, u,
         translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_MAP}') AS m
  FROM norm WHERE length(u) > 0
),
chars AS (
  SELECT w, u, t.i, substr(m, cast(t.i AS INTEGER), 1) AS c
  FROM mapped, generate_series(1, 40) t(i)
  WHERE t.i <= length(m)
),
collapsed AS (
  SELECT w, u, i, c
  FROM (
    SELECT w, u, i, c, lag(c) OVER (PARTITION BY w ORDER BY i) AS pc
    FROM chars
  ) x
  WHERE pc IS NULL OR c <> pc
),
agg AS (
  SELECT w, u, string_agg(c, '' ORDER BY i) AS cm FROM collapsed
  GROUP BY w, u
)
SELECT w,
       substr(u, 1, 1)
         || substr(regexp_replace(substr(cm, 2), '0', '', 'g') || '000', 1, 3)
         AS sx
FROM agg
"""


@register("func_soundex_phonetic", oracle=_SOUNDEX_ORACLE, tags=("functions",))
def func_soundex_phonetic(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    c = table(spark, sf_dir, "customer")
    words = (
        p.select(F.explode(F.split("p_name", " ")).alias("w"))
        .union(c.select(F.lower("c_mktsegment").alias("w")))
        .distinct()
    )
    return words.select("w", F.soundex("w").alias("sx"))


# --------------------------------------------------------------------------
# Spark 4 SQL surface: SQL-defined UDF (CREATE TEMPORARY FUNCTION ...
# RETURN <expr>, SPARK-46246) composed with SQL pipe syntax (FROM ... |>
# WHERE ... |> EXTEND ... |> AGGREGATE ..., SPARK-49555) — the modern
# declarative forms a user migrating analytics to this engine would
# write. A SQL UDF is a Catalyst-inlined EXPRESSION (no Python, no
# serialization boundary, full codegen/pushdown — the opposite of a
# row-wise UDF), so the plan is identical to writing the expression
# inline; the pipe query is Q1-lite over lineitem. Money stays exact:
# the UDF rounds discounted prices at scale 10000 (price and discount
# each carry 2 decimal digits, so price*(1-disc) carries 4 — the
# ``_util.lsum`` rule) BEFORE the sum; every per-row product is then an
# exactly representable integer with NO .5 ties left to resolve, and
# both engines aggregate identical longs (the oracle inlines the same
# expression — DuckDB has no SQL-UDF-with-pipe surface to mirror, which
# is the point: the RESULT contract, not the syntax, is what the oracle
# checks). ADVICE r9: the previous scale-100 form had genuine half-cent
# ties that resolved by double representation; scale 10000 removes them.
# --------------------------------------------------------------------------

_SQL_UDF_PIPE_ORACLE = """
SELECT l_returnflag,
       cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS disc_revenue_e4,
       cast(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag
"""


@register(
    "func_sql_udf_pipe",
    oracle=_SQL_UDF_PIPE_ORACLE,
    tags=("functions", "sql"),
)
def func_sql_udf_pipe(spark, sf_dir):
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION omdp_disc_e4("
        "p DOUBLE, d DOUBLE) RETURNS BIGINT "
        "RETURN cast(round(p * (1 - d) * 10000) AS BIGINT)"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "omdp_pipe_lineitem"
    )
    return spark.sql(
        """
        FROM omdp_pipe_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND omdp_disc_e4(l_extendedprice, l_discount) AS dc
        |> AGGREGATE sum(dc) AS disc_revenue_e4,
                     count(*) AS n_items
           GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# URL parsing (r10): Spark's Hive-compatible ``parse_url`` vs an
# independent RFC-3986 regex derivation in DuckDB — a real spec check of
# the native function (like soundex above), including its edge contract:
# PATH on a path-less URL is the EMPTY STRING while absent QUERY/REF/
# USERINFO are NULL (DuckDB's regexp_extract returns '' on no match, so
# the oracle wraps exactly the null-returning parts in nullif). The
# fixture covers ports, userinfo, encoded spaces, fragments, and
# query-param extraction ('x'). Complements dedup_url_normalize (which
# canonicalizes); this exposes the raw component API a crawl pipeline
# uses for host-level grouping and robots/TLD policies.
# --------------------------------------------------------------------------

_URL_FIXTURE = [
    "https://example.com/path/a?x=1&y=2#frag",
    "http://sub.example.org:8080/p?q=hello%20world",
    "https://example.com/",
    "ftp://files.example.net/pub/file.txt",
    "https://user:pw@secure.example.com:8443/login?next=/home&x=9",
    "http://example.com?x=1",
    "https://example.com/a/b/c",
]


def _url_oracle() -> str:
    values = ",\n  ".join(f"('{u}')" for u in _URL_FIXTURE)
    return f"""
SELECT url,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://(?:[^/?#@]*@)?([^:/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
       nullif(regexp_extract(url, '\\?([^#]*)', 1), '') AS query,
       nullif(regexp_extract(url, '[?&]x=([^&#]*)', 1), '') AS px,
       nullif(regexp_extract(url, '#(.*)$', 1), '') AS ref,
       nullif(regexp_extract(url, '^[a-z]+://([^/?#@]*)@', 1), '') AS ui
FROM (VALUES
  {values}
) t(url)
"""


@register("func_url_parse", oracle=_url_oracle(), tags=("functions", "string"))
def func_url_parse(spark, sf_dir):
    df = spark.createDataFrame([(u,) for u in _URL_FIXTURE], "url string")
    return df.selectExpr(
        "url",
        "parse_url(url, 'PROTOCOL') AS proto",
        "parse_url(url, 'HOST') AS host",
        "parse_url(url, 'PATH') AS path",
        "parse_url(url, 'QUERY') AS query",
        "parse_url(url, 'QUERY', 'x') AS px",
        "parse_url(url, 'REF') AS ref",
        "parse_url(url, 'USERINFO') AS ui",
    )
