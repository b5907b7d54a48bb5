"""Interval algebra + deterministic systematic sampling.

- ``ts_interval_union_coverage``: classic interval-union ("how many
  seconds was each user active, counting overlaps once") — every event
  opens a 300 s activity interval; overlapping/adjacent intervals merge
  into islands via the running-max-of-end trick (one window partitioned
  by user — never global), then coverage = Σ(island end − island start).
  The same shape computes SLA uptime, ad-exposure, and sessionized
  dwell-time at any scale because all state is per-user.

- ``sample_systematic_stride``: systematic (every k-th) sampling in a
  deterministic pseudo-random order — rows ranked by md5(event_id) (both
  engines sort hex digests identically), the global rank from the
  scale-safe two-pass row_number, keep rank % 97 == 1. Equivalent to a
  1/97 rate with *guaranteed* spacing (no clumping, unlike Bernoulli),
  the property stratified evaluation sets care about; per-type counts in
  the output show the stratification balance.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ._util import two_pass_global_window

_SPAN = 300  # seconds each event keeps the user "active"

_COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         cast(floor(epoch(ts)) AS BIGINT) AS s,
         cast(floor(epoch(ts)) AS BIGINT) + {_SPAN} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -9223372036854775808)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island,
         min(s) AS island_start, max(e) AS island_end
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_islands,
       cast(sum(island_end - island_start) AS BIGINT) AS coverage_s
FROM merged GROUP BY user_id
"""


@register(
    "ts_interval_union_coverage",
    oracle=_COVERAGE_ORACLE,
    tags=("timeseries", "window"),
    bench=True,
)
def ts_interval_union_coverage(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_timestamp(F.col("ts").cast("timestamp")) + _SPAN).alias("e"),
    )
    order = W.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        (
            F.col("s")
            > F.coalesce(prev_max_end, F.lit(-(2**63)))
        ).cast("long"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("coverage_s"),
    )


_STRIDE = 97

_SYSTEMATIC_ORACLE = f"""
WITH ranked AS (
  SELECT event_type,
         cast(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY md5(cast(event_id AS VARCHAR)), event_id)
           AS rn
  FROM events
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_sampled,
       cast(sum(cents) AS BIGINT) AS sum_cents
FROM ranked
WHERE rn % {_STRIDE} = 1
GROUP BY event_type
"""


@register("sample_systematic_stride", oracle=_SYSTEMATIC_ORACLE, tags=("sample",))
def sample_systematic_stride(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.md5(F.col("event_id").cast("string")).alias("h"),
        "event_id",
    )
    ranked = two_pass_global_window(ev, ["h", "event_id"], out_col="rn")
    return (
        ranked.filter(F.col("rn") % _STRIDE == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# --------------------------------------------------------------------------
# NEAREST as-of join with tolerance: for every purchase, the click by the
# same user closest in time (either direction) within 1 h. Composition of
# two scale-safe backward as-of joins (operators/asof.py union-then-window
# form) — the forward pass is the backward join on NEGATED time — then a
# per-row arbitration: smaller |gap| wins, exact ties prefer the backward
# (earlier) candidate. pandas.merge_asof(direction='nearest') semantics,
# distributed.
# --------------------------------------------------------------------------

_TOL_S = 3600

_NEAREST_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, cast(floor(epoch(ts)) AS BIGINT) AS s
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, cast(floor(epoch(ts)) AS BIGINT) AS cs
  FROM events WHERE event_type = 'click'
),
cand AS (
  SELECT p.event_id, c.click_id, c.cs - p.s AS gap_s,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(c.cs - p.s),
                    CASE WHEN c.cs <= p.s THEN 0 ELSE 1 END,
                    CASE WHEN c.cs <= p.s THEN -c.click_id ELSE c.click_id END
         ) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND abs(c.cs - p.s) <= {_TOL_S}
)
SELECT event_id, click_id, gap_s FROM cand WHERE rn = 1
"""


@register("ts_asof_nearest_click", oracle=_NEAREST_ORACLE, tags=("timeseries", "join"))
def ts_asof_nearest_click(spark, sf_dir):
    from .asof import asof_join

    ev = table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", s.alias("s")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", s.alias("cs")
    )
    back = asof_join(
        p, c, "user_id", "user_id", "s", "cs",
        value_cols=["click_id", "cs"], right_tiebreak="click_id",
    ).withColumnsRenamed({"click_id": "b_id", "cs": "b_cs"})
    # forward pass: negate time so "latest <=" becomes "earliest >=";
    # negate the tiebreak so equal-time ties pick the SMALLEST click id
    c_neg = c.select(
        "click_id",
        "user_id",
        (-F.col("cs")).alias("ncs"),
        (-F.col("click_id")).alias("ntb"),
    )
    p_neg = p.select("event_id", "user_id", (-F.col("s")).alias("ns"))
    fwd = asof_join(
        p_neg, c_neg, "user_id", "user_id", "ns", "ncs",
        value_cols=["click_id", "ncs"], right_tiebreak="ntb",
    ).select(
        "event_id",
        F.col("click_id").alias("f_id"),
        (-F.col("ncs")).alias("f_cs"),
    )
    both = back.select("event_id", "s", "b_id", "b_cs").join(fwd, "event_id")
    bgap = F.col("s") - F.col("b_cs")
    fgap = F.col("f_cs") - F.col("s")
    # tolerance gates each side BEFORE arbitration: a nearer candidate that
    # is outside the tolerance must not shadow a farther in-tolerance one
    b_ok = F.col("b_id").isNotNull() & (bgap <= _TOL_S)
    f_ok = F.col("f_id").isNotNull() & (fgap <= _TOL_S)
    pick_back = b_ok & (~f_ok | (bgap <= fgap))
    chosen = both.filter(b_ok | f_ok).select(
        "event_id",
        F.when(pick_back, F.col("b_id")).otherwise(F.col("f_id")).alias("click_id"),
        F.when(pick_back, -bgap).otherwise(fgap).alias("gap_s"),
    )
    return chosen


# --------------------------------------------------------------------------
# Rolling regression: least-squares slope of value (cents) against the
# event index over a trailing 7-row frame per user — the windowed trend
# estimator behind "is this metric drifting". All five sufficient
# statistics (n, Σx, Σy, Σxy, Σx²) are integer window sums over the frame
# with x = the in-user row index (small, so every product stays far from
# int64 limits); the slope is reported ppm-quantized with the same split
# division both engines use. Sampled to every 10th row to keep the
# contract result compact.
# --------------------------------------------------------------------------

_REG_FRAME = 7

_MOVING_REG_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id,
         cast(round(value * 100) AS BIGINT) AS y,
         cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS x
  FROM events
),
frames AS (
  SELECT user_id, event_id, x,
         count(*) OVER w AS n,
         sum(x) OVER w AS sx,
         sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx
  FROM seq
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN {_REG_FRAME - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id,
       cast(n AS BIGINT) AS n,
       cast(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE ((n * sxy - sx * sy) // (n * sxx - sx * sx)) * 1000000
               + (((n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000000)
                 // (n * sxx - sx * sx) END AS BIGINT) AS slope_ppm
FROM frames
WHERE x % 10 = 0
"""


@register("window_moving_regression", oracle=_MOVING_REG_ORACLE, tags=("window", "ml"))
def window_moving_regression(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    seq_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.row_number().over(seq_w).cast("long").alias("x"),
    )
    fw = (
        W.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-(_REG_FRAME - 1), 0)
    )
    frames = seq.select(
        "user_id",
        "event_id",
        "x",
        F.count(F.lit(1)).over(fw).alias("n"),
        F.sum("x").over(fw).alias("sx"),
        F.sum("y").over(fw).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fw).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fw).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        frames.filter(F.col("x") % 10 == 0)
        .select(
            "user_id",
            "event_id",
            "n",
            F.when(den == 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr(
                    "((n * sxy - sx * sy) div (n * sxx - sx * sx)) * 1000000"
                    " + (((n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000000)"
                    "   div (n * sxx - sx * sx)"
                )
            )
            .alias("slope_ppm"),
        )
    )


# --------------------------------------------------------------------------
# LTTB downsampling (Largest-Triangle-Three-Buckets) — the standard
# visual-fidelity decimation for time series. Distributed variant: both
# triangle anchors are the NEIGHBOR BUCKET AVERAGES (classic LTTB anchors
# the left side on the previously selected point, a sequential chain; the
# fixed-anchor form is the order-free equivalent used by parallel
# implementations and differs only in which near-optimal point a bucket
# keeps). Everything is integer: x = global rank (two-pass), y = cents,
# anchors are floor-scaled bucket means, and the doubled triangle area is
# an exact int64 cross product — argmax per bucket with (area desc, x asc)
# ties. First/last buckets keep their first/last point, as LTTB requires.
# --------------------------------------------------------------------------

_LTTB_B = 100  # output points (buckets)

_LTTB_ORACLE = f"""
WITH seq AS (
  SELECT cast(round(value * 100) AS BIGINT) AS y,
         row_number() OVER (ORDER BY ts, event_id) - 1 AS x,
         count(*) OVER () AS n
  FROM events
),
pts AS (
  SELECT x, y, (x * {_LTTB_B}) // n AS b FROM seq
),
anch AS (
  SELECT b,
         count(*) AS cnt,
         (sum(x) * 1000000) // count(*) AS ax,
         (sum(y) * 1000000) // count(*) AS ay
  FROM pts GROUP BY b
),
scored AS (
  SELECT p.b, p.x, p.y,
         abs((p.x * 1000000 - l.ax) * (r.ay - l.ay)
             - (r.ax - l.ax) * (p.y * 1000000 - l.ay)) AS area2
  FROM pts p
  JOIN anch l ON l.b = p.b - 1
  JOIN anch r ON r.b = p.b + 1
),
mid AS (
  SELECT b, x, y FROM (
    SELECT b, x, y,
           row_number() OVER (PARTITION BY b ORDER BY area2 DESC, x) AS rn
    FROM scored
  ) s WHERE rn = 1
),
edges AS (
  SELECT 0 AS b, x, y FROM pts WHERE b = 0
  ORDER BY x LIMIT 1
),
last_edge AS (
  SELECT {_LTTB_B} - 1 AS b, x, y FROM pts WHERE b = {_LTTB_B} - 1
  ORDER BY x DESC LIMIT 1
)
SELECT cast(b AS BIGINT) AS bucket, cast(x AS BIGINT) AS x, y FROM edges
UNION ALL
SELECT cast(b AS BIGINT), cast(x AS BIGINT), y FROM mid
  WHERE b > 0 AND b < {_LTTB_B} - 1
UNION ALL
SELECT cast(b AS BIGINT), cast(x AS BIGINT), y FROM last_edge
"""


@register("ts_downsample_lttb", oracle=_LTTB_ORACLE, tags=("timeseries", "sample"))
def ts_downsample_lttb(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("y"),
        "ts",
        "event_id",
    )
    n = ev.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    seq = (
        two_pass_global_window(ev, ["ts", "event_id"], out_col="rn")
        .crossJoin(F.broadcast(n))
        .select(
            "y",
            (F.col("rn") - 1).alias("x"),
            F.expr(f"((rn - 1) * {_LTTB_B}) div __n").alias("b"),
        )
    )
    # Fixed-point widths: anchor sums and the cross product run in
    # decimal(38,0), not int64. sum(x) over a bucket is ~n^2/B and the
    # doubled-area product is (dx*1e6)*(dy*1e6) ~ n*yrange*1e12 — both
    # blow through 9.2e18 around sf1 of the 10x derived events table
    # (ANSI mode surfaced this as ARITHMETIC_OVERFLOW; non-ANSI would
    # have silently wrapped and picked wrong points). decimal(38,0)
    # holds ~1e38: exact up to ~1e12 rows x ~1e12 fixed-point y-range.
    # The DuckDB oracle already sums/multiplies in HUGEINT (int128), so
    # the SQL text is unchanged; the means themselves (<= n*1e6) stay
    # inside int64 for any realistic row count.
    dec = "decimal(38,0)"
    anch = seq.groupBy("b").agg(
        F.expr(f"cast((sum(cast(x as {dec})) * 1000000) div count(*) as long)").alias("ax"),
        F.expr(f"cast((sum(cast(y as {dec})) * 1000000) div count(*) as long)").alias("ay"),
    )
    left = anch.select((F.col("b") + 1).alias("b"), F.col("ax").alias("lax"), F.col("ay").alias("lay"))
    right = anch.select((F.col("b") - 1).alias("b"), F.col("ax").alias("rax"), F.col("ay").alias("ray"))
    dxl = F.col("x").cast(dec) * 1000000 - F.col("lax").cast(dec)
    dyl = F.col("y").cast(dec) * 1000000 - F.col("lay").cast(dec)
    rdx = F.col("rax").cast(dec) - F.col("lax").cast(dec)
    rdy = F.col("ray").cast(dec) - F.col("lay").cast(dec)
    scored = (
        seq.join(F.broadcast(left), "b")
        .join(F.broadcast(right), "b")
        .select(
            "b",
            "x",
            "y",
            F.abs(dxl * rdy - rdx * dyl).alias("area2"),
        )
    )
    w = W.partitionBy("b").orderBy(F.col("area2").desc(), "x")
    mid = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("b") > 0) & (F.col("b") < _LTTB_B - 1))
        .select(F.col("b").alias("bucket"), "x", "y")
    )
    first = (
        seq.filter(F.col("b") == 0)
        .orderBy("x")
        .limit(1)
        .select(F.col("b").alias("bucket"), "x", "y")
    )
    last = (
        seq.filter(F.col("b") == _LTTB_B - 1)
        .orderBy(F.col("x").desc())
        .limit(1)
        .select(F.col("b").alias("bucket"), "x", "y")
    )
    return first.unionAll(mid).unionAll(last)


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences — the behavioral
# sequence model behind session analysis and synthetic-journey generation.
# One lag window per user gives (from_type -> to_type) pairs; counts
# row-normalize to exact ppm. '_start' rows capture the initial-state
# distribution.
# --------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                  '_start') AS from_type,
         event_type AS to_type
  FROM events
),
cnt AS (
  SELECT from_type, to_type, cast(count(*) AS BIGINT) AS n
  FROM seq GROUP BY from_type, to_type
),
tot AS (
  SELECT from_type, sum(n) AS row_n FROM cnt GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       cast((c.n * 1000000) // t.row_n AS BIGINT) AS p_ppm
FROM cnt c JOIN tot t ON t.from_type = c.from_type
"""


@register("ts_markov_transitions", oracle=_MARKOV_ORACLE, tags=("timeseries", "agg"))
def ts_markov_transitions(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("_start")).alias(
            "from_type"
        ),
        F.col("event_type").alias("to_type"),
    )
    cnt = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) div row_n").alias("p_ppm"),
    )


# --------------------------------------------------------------------------
# OHLC bars: the canonical time-series downsample — per (hour, event_type)
# bucket, the first (open) and last (close) value plus min/max and volume.
# open/close are argmin/argmax over a UNIQUE packed ordering key
# (unix-microseconds * 1e20 + event_id, decimal(38,0) on Spark / HUGEINT
# in the oracle — same stride rationale as agg_min_max_by: a bigint pack
# mis-orders once the tie-break key outgrows the stride, and 1e20 outruns
# any int64 id space; epoch-micros ~1.7e15 keeps the product < 1.8e35,
# inside 38 digits). ONE map-side-combinable aggregation, no window, no
# sort: at 100 TB this is a single shuffle of (bucket, type) partial
# states, the shape OLAP rollups and feature-store downsamplers need.
# min/max/argmin of doubles copy stored values bit-for-bit (no float
# arithmetic), so cross-engine parity is exact without rounding.
# --------------------------------------------------------------------------

_OHLC_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       min_by(value, cast(epoch_us(ts) AS HUGEINT)
                     * 100000000000000000000 + event_id) AS open_val,
       max(value) AS high_val,
       min(value) AS low_val,
       max_by(value, cast(epoch_us(ts) AS HUGEINT)
                     * 100000000000000000000 + event_id) AS close_val,
       cast(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2
"""


@register("ts_ohlc_bars", oracle=_OHLC_ORACLE, tags=("timeseries", "agg"))
def ts_ohlc_bars(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The NTZ->TZ cast
    # interprets wall-clock in the session timezone, which every
    # sanctioned path pins to UTC (session.py TUNED_CONFS — get_spark and
    # the driver's _tuned wrapper both apply it), matching DuckDB's
    # epoch_us on the naive timestamp.
    packed = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(38,0)")
        * F.expr("cast('100000000000000000000' as decimal(38,0))")
        + F.col("event_id")
    )
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.min_by("value", packed).alias("open_val"),
        F.max("value").alias("high_val"),
        F.min("value").alias("low_val"),
        F.max_by("value", packed).alias("close_val"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Sliding distinct users via MERGEABLE HLL sketches (r9): trailing
# 3-bucket distinct-user counts where the estimate comes from per-bucket
# DataSketches HLL unioned over a window frame — the 100 TB form of
# "distinct over a sliding window". An exact windowed COUNT(DISTINCT)
# re-touches every raw row per window; the sketch form aggregates each
# bucket ONCE (map-side combinable) and the slide is a union of
# fixed-size sketches over the bucket table, whose cardinality is bounded
# by the time span — the partitionless windows below run over that
# bounded aggregate, the same sanctioned shape as _util's offsets tables.
# Verdict oracle (same pattern as agg_hll_sketch_merge): DuckDB computes
# the EXACT trailing counts and predicts within_5pct = TRUE for every
# window; Spark computes the estimate and tests it against its own exact
# twin (distinct pairs exploded to the <=3 bucket-rank windows they
# serve — map-side fan-out, no theta join against the pair stream). An
# HLL drift past 5% (lgK=12 => ~1.6% expected) turns a verdict FALSE and
# the driver row red.
# --------------------------------------------------------------------------

_SLIDING_HLL_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT date_trunc('hour', ts) AS b, user_id AS u FROM events
),
bk AS (
  SELECT b, row_number() OVER (ORDER BY b) AS r
  FROM (SELECT DISTINCT b FROM pairs)
),
x AS (
  SELECT tgt.b AS bucket, p.u
  FROM pairs p
  JOIN bk src ON p.b = src.b
  JOIN bk tgt ON tgt.r BETWEEN src.r AND src.r + 2
)
SELECT bucket, cast(count(DISTINCT u) AS BIGINT) AS n_exact,
       TRUE AS within_5pct
FROM x GROUP BY bucket
"""


@register(
    "ts_sliding_distinct_hll",
    oracle=_SLIDING_HLL_ORACLE,
    tags=("timeseries", "agg", "sketch"),
)
def ts_sliding_distinct_hll(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("b"), F.col("user_id").alias("u")
    )
    # one sketch per bucket (partial+final agg over raw rows — the only
    # pass that touches the full input)
    sk = e.groupBy("b").agg(F.expr("hll_sketch_agg(u)").alias("sk"))
    est = sk.select(
        "b",
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sk) OVER "
            "(ORDER BY b ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))"
        ).alias("n_est"),
    )
    # exact twin: distinct pairs fan out to the <=3 bucket-rank windows
    # they serve (map-side sequence explode; the bucket-rank dim is
    # bounded by the time span and the rank window's input is an
    # aggregate, not the raw scan)
    bk = sk.select("b").select(
        "b", F.expr("row_number() OVER (ORDER BY b)").alias("r")
    )
    pairs = e.distinct().join(bk, "b")
    exact = (
        pairs.select(
            "u", F.explode(F.expr("sequence(r, r + 2)")).alias("tr")
        )
        .groupBy("tr")
        .agg(F.countDistinct("u").alias("n_exact"))
        .join(bk.withColumnRenamed("r", "tr"), "tr")
        .select(F.col("b").alias("bucket"), "n_exact")
    )
    return exact.join(est, exact.bucket == est.b).select(
        "bucket",
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact")) * 20 <= F.col("n_exact")
        ).alias("within_5pct"),
    )
