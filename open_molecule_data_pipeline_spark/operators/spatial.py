"""Spatial grid join: ε-neighbor pairs in 2-D via cell bucketing.

The 2-D analogue of the binned range join (`join_range_binned`): finding
all point pairs within an L∞ radius ε is a quadratic predicate, but
bucketing points into ε-sized grid cells turns it into an EQUI-join —
each point probes its own cell plus the 8 neighbors, a candidate pair can
only live in adjacent cells, and the exact |dx|<=ε ∧ |dy|<=ε predicate
verifies candidates after the join. Cost tracks true point density per
cell, never n². This is the standard distributed shape for radius search /
spatial self-join (geohash / H3 pipelines at planetary scale use exactly
this with hierarchical cells).

Pair-orientation dedup is structural, not a distinct(): only the LEFT side
probes neighbor cells and the id_a < id_b filter keeps exactly one of the
two probe directions, so no candidate is ever generated twice.

Points are synthesized deterministically from events (integer cents of
``value`` × a multiplicative scatter of event_id), so both engines agree
bit-for-bit; the oracle is an honest brute-force range join (DuckDB plans
it as an IEJoin), proving the grid join loses no pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_EPS = 50  # L-infinity radius, integer units

_SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT event_id,
         cast(round(value * 100) AS BIGINT) AS x,
         (event_id * 37) % 10000 AS y
  FROM events
)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       b.x - a.x AS dx, b.y - a.y AS dy
FROM pts a JOIN pts b
  ON a.event_id < b.event_id
 AND abs(a.x - b.x) <= {_EPS}
 AND abs(a.y - b.y) <= {_EPS}
"""


@register("join_spatial_grid", oracle=_SPATIAL_ORACLE, tags=("join", "spatial"))
def join_spatial_grid(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        ((F.col("event_id") * 37) % 10000).alias("y"),
    ).withColumn("cx", F.floor(F.col("x") / _EPS)).withColumn(
        "cy", F.floor(F.col("y") / _EPS)
    )
    offsets = F.expr(
        "explode(array(-1, 0, 1))"
    )  # probe offsets; applied twice below for the 3x3 neighborhood
    probe = (
        pts.select(
            F.col("event_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            "cx",
            "cy",
        )
        .withColumn("ox", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("oy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("cx") + F.col("ox")).alias("pcx"),
            (F.col("cy") + F.col("oy")).alias("pcy"),
        )
    )
    home = pts.select(
        F.col("event_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
    )
    return (
        probe.join(home, ["pcx", "pcy"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("xa") - F.col("xb")) <= _EPS)
            & (F.abs(F.col("ya") - F.col("yb")) <= _EPS)
        )
        .select(
            "id_a",
            "id_b",
            (F.col("xb") - F.col("xa")).alias("dx"),
            (F.col("yb") - F.col("ya")).alias("dy"),
        )
    )
