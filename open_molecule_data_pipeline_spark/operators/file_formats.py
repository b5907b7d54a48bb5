"""File-format surface as driver-checkable queries.

``sources/formats.py`` + ``tests/test_formats.py`` cover the full
format matrix (parquet/orc/csv/json/text, partitionBy, bucketBy,
compaction); these queries put representative round-trips inside the
driver's correctness window: write the data out through a non-parquet
format, read it back, aggregate, and compare against the oracle computed
from the original parquet — any loss or corruption in the round-trip
breaks the hash.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from hashlib import md5
from pathlib import Path

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import lsum, s_lsum

_CSV_ORACLE = f"""
SELECT l_returnflag,
       cast(count(*) AS BIGINT) AS n,
       {s_lsum('l_quantity', 100)} AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


def _scratch(kind: str, sf_dir: str) -> Path:
    """Fresh scratch dir for one round-trip.

    The root must be visible to every executor: local mode's /tmp works, a
    real cluster points ``SPARK_GRAFT_SCRATCH_DIR`` at shared storage (the
    write and the read-back run as separate Spark jobs, so a node-local path
    would make executors read back only their own shards). Each call gets a
    per-run nonce so two concurrent runs over the same sf_dir can't clobber
    each other's data mid-read; superseded dirs from earlier runs of the
    same (kind, sf_dir) are swept once they're safely stale.
    """
    root = Path(os.environ.get("SPARK_GRAFT_SCRATCH_DIR", tempfile.gettempdir()))
    tag = md5(f"{kind}|{sf_dir}".encode()).hexdigest()[:12]
    prefix = f"omdp_roundtrip_{kind}_{tag}_"
    cutoff = time.time() - 1800  # anything older than 30 min is not mid-read
    for old in root.glob(f"{prefix}*"):
        try:
            if old.stat().st_mtime < cutoff:
                shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass
    return root / f"{prefix}{uuid.uuid4().hex[:8]}"


@register("format_roundtrip_csv", oracle=_CSV_ORACLE, tags=("formats",))
def format_roundtrip_csv(spark, sf_dir):
    """parquet -> gzip CSV partitioned by l_returnflag -> read -> aggregate.

    Doubles survive because Spark writes shortest-round-trip decimal
    strings; the partition column comes back from directory names, so the
    layout (Hive-style partitioning) is exercised too.
    """
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = _scratch("csv", sf_dir)
    (
        l.write.mode("overwrite")
        .option("compression", "gzip")
        .option("header", "true")
        .partitionBy("l_returnflag")
        .csv(str(out))
    )
    back = (
        spark.read.schema("l_orderkey bigint, l_quantity double, l_returnflag string")
        .option("header", "true")
        .csv(str(out))
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), lsum("l_quantity", 100).alias("sum_qty")
    )


_JSON_ORACLE = """
SELECT o_orderpriority,
       cast(count(*) AS BIGINT) AS n,
       cast(min(o_orderkey) AS BIGINT) AS min_key,
       cast(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderpriority
"""


@register("format_roundtrip_json", oracle=_JSON_ORACLE, tags=("formats",))
def format_roundtrip_json(spark, sf_dir):
    """parquet -> gzip NDJSON -> schema-pinned read -> aggregate."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    out = _scratch("json", sf_dir)
    o.write.mode("overwrite").option("compression", "gzip").json(str(out))
    back = spark.read.schema("o_orderkey bigint, o_orderpriority string").json(
        str(out)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


_XML_ORACLE = """
SELECT c_mktsegment,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(c_custkey) AS BIGINT) AS sum_key
FROM customer
GROUP BY c_mktsegment
"""


@register("format_roundtrip_xml", oracle=_XML_ORACLE, tags=("formats",))
def format_roundtrip_xml(spark, sf_dir):
    """parquet -> XML (Spark 4 built-in source, rowTag rows) -> schema-pinned
    read -> aggregate. XML is the interchange format of several chemistry
    registries (the reference's PubChem domain), so the round-trip belongs
    in the driver window."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    out = _scratch("xml", sf_dir)
    c.write.mode("overwrite").format("xml").option("rowTag", "row").save(str(out))
    back = (
        spark.read.schema("c_custkey bigint, c_mktsegment string")
        .format("xml")
        .option("rowTag", "row")
        .load(str(out))
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("sum_key")
    )


# --------------------------------------------------------------------------
# Corrupt-record tolerance: at 100 TB some shard of any text-format feed is
# malformed, and the pipeline must quarantine rows, not die or silently
# drop. Deterministically corrupt every 97th order line, read back in
# PERMISSIVE mode with a corrupt-record column, and reconcile good vs
# quarantined counts against the closed-form oracle.
# --------------------------------------------------------------------------

_CORRUPT_ORACLE = """
SELECT cast(count(*) FILTER (o_orderkey % 97 <> 0) AS BIGINT) AS n_good,
       cast(count(*) FILTER (o_orderkey % 97 = 0) AS BIGINT) AS n_corrupt,
       cast(sum(o_orderkey) FILTER (o_orderkey % 97 <> 0) AS BIGINT) AS sum_good_keys
FROM orders
"""


@register("format_corrupt_tolerance", oracle=_CORRUPT_ORACLE, tags=("formats",))
def format_corrupt_tolerance(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    line = F.when(
        F.col("o_orderkey") % 97 == 0,
        F.concat(F.lit("BADROW<"), F.col("o_orderkey").cast("string"), F.lit(">")),
    ).otherwise(F.concat(F.col("o_orderkey").cast("string"), F.lit(",1.00")))
    out = _scratch("corrupt", sf_dir)
    o.select(line.alias("value")).write.mode("overwrite").text(str(out))
    back = (
        spark.read.schema(
            "o_orderkey bigint, o_totalprice double, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(out))
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("o_orderkey"))).alias(
            "sum_good_keys"
        ),
    )


# --------------------------------------------------------------------------
# Schema evolution: a long-lived 100 TB table accretes columns over time;
# old parquet files simply lack the new ones. Write epoch-1 files without
# o_orderstatus and epoch-2 files with it, read the union back with
# mergeSchema, and verify Spark fills the missing column with NULL —
# reconciled against the closed-form oracle on the original table.
# --------------------------------------------------------------------------

_EVOLUTION_ORACLE = """
SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-schema>' ELSE o_orderstatus END
         AS status,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(o_orderkey) AS BIGINT) AS sum_keys
FROM orders
GROUP BY CASE WHEN o_orderkey % 2 = 0 THEN '<pre-schema>' ELSE o_orderstatus END
"""


@register(
    "format_schema_evolution", oracle=_EVOLUTION_ORACLE, tags=("formats",)
)
def format_schema_evolution(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    out = _scratch("evolve", sf_dir)
    old = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus"
    )
    old.write.mode("overwrite").parquet(f"{out}/epoch=1")
    new.write.mode("overwrite").parquet(f"{out}/epoch=2")
    back = spark.read.option("mergeSchema", "true").parquet(str(out))
    return back.groupBy(
        F.coalesce("o_orderstatus", F.lit("<pre-schema>")).alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("sum_keys"),
    )


_ORC_ORACLE = f"""
SELECT p_brand,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(p_size) AS BIGINT) AS sum_size,
       {s_lsum('p_retailprice', 100)} AS sum_price
FROM part
GROUP BY p_brand
"""


@register("format_roundtrip_orc", oracle=_ORC_ORACLE, tags=("formats",))
def format_roundtrip_orc(spark, sf_dir):
    """parquet -> zlib ORC partitioned by p_brand -> read -> aggregate.

    ORC is the third columnar format in the matrix (after parquet and the
    row formats); doubles round-trip bit-exact because ORC stores IEEE754
    doubles natively — no string conversion is involved.
    """
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    out = _scratch("orc", sf_dir)
    (
        p.write.mode("overwrite")
        .option("compression", "zlib")
        .partitionBy("p_brand")
        .orc(str(out))
    )
    back = spark.read.orc(str(out))
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_size").cast("long").alias("sum_size"),
        lsum("p_retailprice", 100).alias("sum_price"),
    )


_BUCKETED_ORACLE = f"""
SELECT cast(count(*) AS BIGINT) AS n,
       {s_lsum('l.l_extendedprice', 100)} AS sum_price,
       {s_lsum('o.o_totalprice', 100)} AS sum_total
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@register(
    "format_bucketed_join",
    oracle=_BUCKETED_ORACLE,
    tags=("formats", "join"),
)
def format_bucketed_join(spark, sf_dir):
    """Co-located (bucketed) join: both tables pre-hashed into the same
    bucket layout on the join key, so the sort-merge join reads bucket i
    against bucket i with NO shuffle exchange — the layout that turns the
    nightly big-fact join from a full-network shuffle into a local merge at
    100 TB. Bucket metadata lives in the session catalog (saveAsTable with
    an external path); the plan lint asserts the join runs without a
    hashpartitioning exchange. The broadcast threshold is irrelevant: the
    merge hint pins SMJ so the bucket layout, not table size, carries the
    demo.
    """
    from uuid import uuid4

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    run = uuid4().hex[:8]
    names = {}
    try:
        for alias, df, key in (
            ("orders_b", o, "o_orderkey"),
            ("lineitem_b", li, "l_orderkey"),
        ):
            tbl = f"omdp_bucketed_{alias}_{run}"
            path = _scratch(f"bucket_{alias}", sf_dir)
            (
                df.write.mode("overwrite")
                .option("path", str(path))
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )
            names[alias] = tbl
        ob = spark.table(names["orders_b"])
        lb = spark.table(names["lineitem_b"])
        joined = lb.hint("merge").join(
            ob, lb["l_orderkey"] == ob["o_orderkey"]
        )
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            lsum("l_extendedprice", 100).alias("sum_price"),
            lsum("o_totalprice", 100).alias("sum_total"),
        )
    finally:
        # The analyzed plan above has already captured the file relations
        # (bucket spec included), so the catalog entries are no longer
        # needed — drop them so repeated invocations don't accumulate
        # metastore tables dangling at swept _scratch paths.
        for tbl in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


# --------------------------------------------------------------------------
# Typed-parquet fidelity round-trip (r13): every logical type the
# warehouse relies on pushed through the parquet writer and back —
# DECIMAL(12,2) (parquet FIXED_LEN_BYTE_ARRAY/INT64 decimal logical
# type, not the source double), DATE, TIMESTAMP, BINARY, BOOLEAN, and
# SMALLINT — then aggregated into exact integers. The other round-trips
# in this family prove FORMATS (csv/json/xml/orc); this one proves the
# TYPE SYSTEM survives the default format end to end (decimal scale
# preserved, date/timestamp epoch math stable, binary bytes intact via
# a distinct-count over md5 prefixes). The oracle computes the same
# aggregates straight from the source rows: any writer/reader type
# coercion (e.g. decimal widened to double, date shifted by timezone)
# breaks the hash.
# --------------------------------------------------------------------------

_TYPED_ORACLE = """
WITH t AS (
  SELECT cast(cast(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(12,2)) AS price,
         cast(l_shipdate AS DATE) AS day,
         l_shipdate AS ts,
         substr(md5(cast(l_orderkey AS VARCHAR)), 1, 4) AS binhex,
         l_returnflag = 'R' AS flag,
         cast(l_linenumber AS SMALLINT) AS ln
  FROM lineitem
)
SELECT cast(count(*) AS BIGINT) AS n,
       cast(round(sum(price) * 100) AS BIGINT) AS sum_price_cents,
       cast(min(day) AS VARCHAR) AS min_day,
       cast(max(day) AS VARCHAR) AS max_day,
       cast(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flag,
       cast(sum(ln) AS BIGINT) AS sum_line,
       cast(count(DISTINCT binhex) AS BIGINT) AS n_bin,
       cast(min(epoch_us(ts)) AS BIGINT) AS min_ts_us
FROM t
"""


@register(
    "format_roundtrip_typed_parquet", oracle=_TYPED_ORACLE, tags=("formats",)
)
def format_roundtrip_typed_parquet(spark, sf_dir):
    """decimal/date/timestamp/binary/boolean/smallint through a parquet
    write + read, aggregated exactly — the type-fidelity check."""
    li = table(spark, sf_dir, "lineitem")
    typed = li.select(
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_shipdate").cast("date").alias("day"),
        F.col("l_shipdate").alias("ts"),
        F.unhex(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4)
        ).alias("bin"),
        (F.col("l_returnflag") == "R").alias("flag"),
        F.col("l_linenumber").cast("smallint").alias("ln"),
    )
    out = _scratch("typed", sf_dir)
    typed.write.mode("overwrite").parquet(str(out))
    back = spark.read.parquet(str(out))
    # the read-back schema must be the written one, not a widened cousin
    assert dict(back.dtypes)["price"] == "decimal(12,2)", back.dtypes
    assert dict(back.dtypes)["day"] == "date", back.dtypes
    assert dict(back.dtypes)["bin"] == "binary", back.dtypes
    assert dict(back.dtypes)["ln"] == "smallint", back.dtypes
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("price") * 100).cast("long").alias("sum_price_cents"),
        F.min("day").cast("string").alias("min_day"),
        F.max("day").cast("string").alias("max_day"),
        F.sum(F.col("flag").cast("long")).cast("long").alias("n_flag"),
        F.sum("ln").cast("long").alias("sum_line"),
        F.countDistinct(F.hex(F.col("bin"))).cast("long").alias("n_bin"),
        F.min(F.expr("unix_micros(cast(ts as timestamp))"))
        .cast("long")
        .alias("min_ts_us"),
    )
