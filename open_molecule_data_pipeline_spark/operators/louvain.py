"""Multi-level Louvain community detection (VERDICT r13 #2).

Iterates the r13-proven one-level machinery — locally-dominant best-gain
move pass (``graph_metrics.graph_louvain_pass``) + community-graph
coarsening (``graph_louvain_coarsen``) — into the full Louvain hierarchy:

    level 0   weighted move sweeps on the raw graph (hash-seeded %64
              communities, the proven pass's seed), up to ``_SWEEPS[0]``
              sweeps; every sweep but the last keeps the scalar
              convergence probe (``kept.count()`` on a checkpointed
              <=32-row table — zero moves => the remaining sweeps are
              exact no-ops and are skipped), while the LAST sweep's
              checkpoint and count are deferred into the coarsen job
              (``probe=False`` — no early exit can follow it)
    coarsen   super-nodes = communities; inter-community edge weight =
              summed crossing weight; a self-loop row per community
              carries its intra-weight. Total weight is CONSERVED, so
              the modularity denominator ``m`` is computed once.
    level 1+  the SAME weighted sweep replayed ON THE DRIVER (VERDICT
              r15 #1b): level-0 community ids live in the seed domain
              {0.._K-1} — moves never mint new ids — so the coarsened
              graph is <= _K nodes / <= _K(_K+1)/2 edge rows BY
              CONSTRUCTION at ANY corpus size, and one O(_K^2)-byte
              collect replaces the deep levels' ~10 sequential
              tiny-table checkpoint/count job barriers (each a full
              scheduler round-trip) that dominated the r14/r15 wall.
              The replay is exact: sweep gains and tie-breaks are pure
              integer arithmetic, identical to the oracle's CTEs.

Modularity is measured with the pass's nano-quantized convention
(per-community term rounded to 1e-9, then an exact int64 sum) for the
COMPOSED assignment after every level — but read off the coarsened
graph each level already materializes (VERDICT r14 #2): coarsening
conserves both the per-community intra-edge count (self-loop weights)
and the summed original degrees, so the (l, dc, m) integers — and hence
the rounded doubles — are identical to a direct original-graph
measurement, at bounded-table cost instead of two |E|-scale joins per
level. The seed-partition Q needs no join at all (``node % K`` is
arithmetic on the edge row). Each kept move has strictly positive gain,
so Q is non-decreasing across sweeps AND levels — pinned in tests.

Why the unrolled oracle is exact despite the dynamic Spark loop: every
sweep is a deterministic function of the current assignment, and a sweep
from a converged state keeps zero moves and returns the same assignment.
The DuckDB oracle therefore unrolls the FULL ``_SWEEPS`` schedule as
static CTEs; Spark's early exits only skip provably-identity suffixes,
so both engines land on the same hierarchy state.

Scale shape (100 TB): level 0 dominates — per sweep, one adjacency x
assignment equi-join + one bounded-(<=64)-community-table broadcast
join, exactly the proven pass's plan; every community-side table is
bounded by the seed count so the per-sweep shuffles move |E| rows of
12-byte keys. Levels >=1 operate on the <=64-node community graph —
driver-free, bounded work regardless of corpus size. The hierarchy depth
and sweep budget are compile-time constants, so total cost is a small
constant multiple of the one-pass cost.

Reference parity: the reference repo has no graph/community layer (its
``analysis/`` package is a docstring-only scaffold, analysis/__init__.py:1);
this implements the standard Louvain method (Blondel et al. 2008) in the
deterministic locally-dominant variant suited to parallel engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_K = 64  # level-0 seed communities (matches graph_louvain_pass)
_SWEEPS = (2, 2, 2)  # move sweeps per level; len() = hierarchy depth


# --------------------------------------------------------------------------
# Oracle: the full hierarchy unrolled as static CTEs.
# --------------------------------------------------------------------------


def _sql_level_pre(level: int, singleton: bool = False) -> str:
    """edges/adjacency/degree/initial-assignment CTEs for one level.

    ``singleton`` switches level 0 to the canonical Blondel
    singleton-start init (graph_louvain_singleton) instead of the
    %_K hash seed."""
    if level == 0:
        edges = (
            "edges_0 AS MATERIALIZED (\n"
            "  SELECT u AS a, v AS b, cast(1 AS BIGINT) AS w FROM e\n)"
        )
        seed = "node" if singleton else f"node % {_K}"
        init = f"c_0_0 AS MATERIALIZED (SELECT node, {seed} AS cid FROM deg_0)"
    else:
        prev_final = f"c_{level - 1}_{_SWEEPS[level - 1]}"
        edges = f"""edges_{level} AS MATERIALIZED (
  SELECT least(pa.cid, pb.cid) AS a, greatest(pa.cid, pb.cid) AS b,
         cast(sum(e.w) AS BIGINT) AS w
  FROM edges_{level - 1} e
  JOIN {prev_final} pa ON pa.node = e.a
  JOIN {prev_final} pb ON pb.node = e.b
  GROUP BY 1, 2
)"""
        init = f"c_{level}_0 AS MATERIALIZED (SELECT node, node AS cid FROM deg_{level})"
    ud = f"""ud_{level} AS MATERIALIZED (
  SELECT a AS u, b AS v, w FROM edges_{level} WHERE a <> b
  UNION ALL
  SELECT b, a, w FROM edges_{level} WHERE a <> b
)"""
    deg = f"""deg_{level} AS MATERIALIZED (
  SELECT node, cast(sum(kc) AS BIGINT) AS k FROM (
    SELECT u AS node, w AS kc FROM ud_{level}
    UNION ALL
    SELECT a, 2 * w FROM edges_{level} WHERE a = b
  ) z GROUP BY node
)"""
    return ",\n".join([edges, ud, deg, init])


def _sql_sweep(level: int, s: int) -> str:
    """One weighted locally-dominant move sweep: c_{l}_{s} -> c_{l}_{s+1}."""
    c = f"c_{level}_{s}"
    t = f"{level}_{s}"
    return f"""dsum_{t} AS MATERIALIZED (
  SELECT c.cid, cast(sum(d.k) AS BIGINT) AS dc
  FROM {c} c JOIN deg_{level} d ON d.node = c.node GROUP BY c.cid
),
nbr_{t} AS MATERIALIZED (
  SELECT ud.u AS node, cv.cid AS b, cast(sum(ud.w) AS BIGINT) AS kub
  FROM ud_{level} ud JOIN {c} cv ON cv.node = ud.v
  GROUP BY ud.u, cv.cid
),
own_{t} AS MATERIALIZED (
  SELECT c.node, c.cid AS a, d.k, coalesce(n.kub, 0) AS kua
  FROM {c} c
  JOIN deg_{level} d ON d.node = c.node
  LEFT JOIN nbr_{t} n ON n.node = c.node AND n.b = c.cid
),
cand_{t} AS MATERIALIZED (
  SELECT o.node, o.a, n.b,
         2 * m.m * (n.kub - o.kua)
           - o.k * (db.dc - da.dc + o.k) AS gain
  FROM own_{t} o
  JOIN nbr_{t} n ON n.node = o.node AND n.b <> o.a
  JOIN dsum_{t} da ON da.cid = o.a
  JOIN dsum_{t} db ON db.cid = n.b, m
),
moves_{t} AS MATERIALIZED (
  SELECT node, a, b, gain FROM (
    SELECT node, a, b, gain,
           row_number() OVER (PARTITION BY node ORDER BY gain DESC, b) AS rn
    FROM cand_{t}
  ) z WHERE rn = 1 AND gain > 0
),
winner_{t} AS MATERIALIZED (
  SELECT c, gain, node FROM (
    SELECT c, gain, node,
           row_number() OVER (PARTITION BY c ORDER BY gain DESC, node DESC)
             AS rn
    FROM (SELECT a AS c, gain, node FROM moves_{t}
          UNION ALL
          SELECT b, gain, node FROM moves_{t}) i
  ) z WHERE rn = 1
),
kept_{t} AS MATERIALIZED (
  SELECT mv.node, mv.b
  FROM moves_{t} mv
  JOIN winner_{t} wa
    ON wa.c = mv.a AND wa.gain = mv.gain AND wa.node = mv.node
  JOIN winner_{t} wb
    ON wb.c = mv.b AND wb.gain = mv.gain AND wb.node = mv.node
),
c_{level}_{s + 1} AS MATERIALIZED (
  SELECT c.node, coalesce(k.b, c.cid) AS cid
  FROM {c} c LEFT JOIN kept_{t} k ON k.node = c.node
)"""


def _sql_q(tag: str, assign: str) -> str:
    """Nano-quantized modularity of ``assign`` on the ORIGINAL graph."""
    return f"""qd_{tag} AS MATERIALIZED (
  SELECT p.cid, cast(sum(d.k) AS BIGINT) AS dc
  FROM {assign} p JOIN deg_0 d ON d.node = p.node GROUP BY p.cid
),
ql_{tag} AS MATERIALIZED (
  SELECT pu.cid, cast(count(*) AS BIGINT) AS l
  FROM e
  JOIN {assign} pu ON pu.node = e.u
  JOIN {assign} pv ON pv.node = e.v
  WHERE pu.cid = pv.cid GROUP BY pu.cid
),
q_{tag} AS MATERIALIZED (
  SELECT cast(sum(
    cast(round((cast(coalesce(ql.l, 0) AS DOUBLE) / cast(m.m AS DOUBLE)
                - (cast(qd.dc AS DOUBLE) / (2.0 * cast(m.m AS DOUBLE)))
                  * (cast(qd.dc AS DOUBLE) / (2.0 * cast(m.m AS DOUBLE))))
               * 1000000000) AS BIGINT)
  ) AS BIGINT) AS q
  FROM qd_{tag} qd LEFT JOIN ql_{tag} ql ON ql.cid = qd.cid, m
)"""


def _multilevel_oracle() -> str:
    parts = [
        """e AS MATERIALIZED (
  SELECT DISTINCT l_suppkey * 2 AS u, l_partkey * 2 + 1 AS v FROM lineitem
),
m AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS m FROM e)"""
    ]
    kept_names = []
    for level, sweeps in enumerate(_SWEEPS):
        parts.append(_sql_level_pre(level))
        for s in range(sweeps):
            parts.append(_sql_sweep(level, s))
            kept_names.append(f"kept_{level}_{s}")
    # composed assignments: comp_l maps ORIGINAL node -> level-l community
    parts.append(f"comp_0 AS MATERIALIZED (SELECT node, cid FROM c_0_{_SWEEPS[0]})")
    for level in range(1, len(_SWEEPS)):
        parts.append(
            f"""comp_{level} AS MATERIALIZED (
  SELECT p.node, c.cid
  FROM comp_{level - 1} p JOIN c_{level}_{_SWEEPS[level]} c ON c.node = p.cid
)"""
        )
    parts.append(_sql_q("seed", "c_0_0"))
    for level in range(len(_SWEEPS)):
        parts.append(_sql_q(f"l{level}", f"comp_{level}"))
    union = "\n    UNION ALL\n    ".join(
        f"SELECT node FROM {k}" for k in kept_names
    )
    parts.append(
        f"nmv AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS n_moves FROM (\n"
        f"    {union}) zz)"
    )
    last = len(_SWEEPS) - 1
    parts.append(
        f"""sizes AS MATERIALIZED (
  SELECT cid, cast(count(*) AS BIGINT) AS n_nodes
  FROM comp_{last} GROUP BY cid
),
tot AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS n_communities FROM sizes)"""
    )
    qcols = ", ".join(
        f"q_l{level}.q AS q_l{level}_nano" for level in range(len(_SWEEPS))
    )
    qfroms = " ".join(
        f"CROSS JOIN q_l{level}" for level in range(len(_SWEEPS))
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT s.cid, s.n_nodes, tot.n_communities, nmv.n_moves,
       q_seed.q AS q_seed_nano, {qcols}
FROM sizes s CROSS JOIN tot CROSS JOIN nmv CROSS JOIN q_seed {qfroms}
ORDER BY s.n_nodes DESC, s.cid
LIMIT 15
"""


# --------------------------------------------------------------------------
# Spark side.
# --------------------------------------------------------------------------


def _lit_map(d):
    """BIGINT literal map expression from a small driver-side dict.

    Only legal for dicts bounded by the ``_K`` seed domain BY CONSTRUCTION
    (assignment overrides, per-community degree sums, level maps): at the
    %_K seed the community-id domain is {0.._K-1} regardless of corpus
    size, so these maps never exceed _K entries at 100 TB either."""
    # One F.expr over a SQL literal string instead of create_map over
    # 2x|d| F.lit().cast() columns: each Column constructor is a py4j
    # round-trip, and a 64-entry map paid ~0.7 s of driver latency PER
    # SWEEP building 256 of them (r16 profile — the inter-job "gap" time
    # of guide §7.3). The parsed expression tree is identical.
    pairs = ", ".join(f"{int(k)}L, {int(d[k])}L" for k in sorted(d))
    return F.expr(f"map({pairs})")


def _seed_assign_expr(col, moved):
    """Seeded level-0 community id of node column ``col`` as a PURE
    expression: the literal moved-override map (<= _K entries — a
    community is the source or destination of at most one kept move per
    sweep, so each sweep contributes <= _K/2 overrides) over the
    arithmetic ``node % _K`` seed. No join, no broadcast, no shuffle."""
    base = (F.col(col) % _K).cast("long")
    if not moved:
        return base
    return F.coalesce(F.try_element_at(_lit_map(moved), F.col(col)), base)


def _sweep_seeded_driver(ud, m_val, moved, dsum):
    """One weighted move sweep of the %_K-seeded level 0 as a SINGLE
    distributed job (r16 optimization round, guide §1.2/§2.4): all
    community-side state — the assignment override map, the per-community
    degree sums, the winner matching — lives on the driver as literal
    expressions and <=_K-row collects, bounded by the seed domain at any
    corpus size.

    Plan: one scan of the cached ``ud`` (hash-partitioned by ``u``) ->
    groupBy(u, cid(v)) -> groupBy(u), both exchange-free on the persisted
    partitioning; per-node candidate argmin over the <=_K-entry community
    list via ``array_min`` (identical (ns, b) tie-break to ``_wsweep``'s
    ns-struct min — ns = -(2m*kub - k*dcb) ranks gains exactly because
    gain(b) = 2m*kub - k*dcb + const(node)); gain filter; then ONE tiny
    exchange aggregating the per-community winner (max(gain, node), the
    oracle's ORDER BY gain DESC, node DESC) and a <=_K-row collect. The
    kept-move matching (a move survives iff it wins BOTH its source and
    destination community) is decided on the driver from the winner rows
    alone: a node's move is incident to exactly its a and b, so it is
    kept iff it is the winner value of both.

    Returns ``{node: (a, b, k)}`` of kept moves; the caller updates the
    override map and degree sums incrementally (dsum[b] += k,
    dsum[a] -= k — exactly the recompute, since moving n changes only
    those two sums by deg(n))."""
    m_lit = F.lit(int(m_val)).cast("long")
    dmap = _lit_map(dsum)
    zero = F.lit(0).cast("long")
    # Window form of the per-node fold (r16): k/kua/candidate-argmin over
    # the per-(u, b) rows via sums and a struct-min PARTITIONED BY u —
    # same exchange-free placement as the collect_list fold (hash(u)
    # clusters both the groupBy(u, b) and the window), but whole-stage
    # codegen instead of interpreted array lambdas over collected lists
    # (higher-order functions never codegen; the fold was the sweep
    # job's per-row hot spot). Arithmetic and (ns, b) tie-break are
    # unchanged, so kept moves are bit-identical.
    wu = Window.partitionBy("u")
    kub_b = (
        ud.groupBy("u", _seed_assign_expr("v", moved).alias("b"))
        .agg(F.sum("w").cast("long").alias("kub"))
        .withColumn("a", _seed_assign_expr("u", moved))
        .withColumn("k", F.sum("kub").over(wu))
        .withColumn(
            "kua",
            F.coalesce(
                F.sum(F.when(F.col("b") == F.col("a"), F.col("kub"))).over(
                    wu
                ),
                zero,
            ),
        )
    )
    per = (
        kub_b.withColumn(
            "cand",
            F.when(
                F.col("b") != F.col("a"),
                F.struct(
                    (
                        -(
                            2 * m_lit * F.col("kub")
                            - F.col("k") * F.try_element_at(dmap, F.col("b"))
                        )
                    ).alias("ns"),
                    F.col("b").alias("b"),
                    F.col("kub").alias("kub"),
                ),
            ),
        )
        .groupBy("u")
        .agg(
            F.first("a").alias("a"),
            F.first("k").alias("k"),
            F.first("kua").alias("kua"),
            F.min("cand").alias("mv"),
        )
    )
    moves = (
        per.where(F.col("mv").isNotNull())
        .select(
            F.col("u").alias("node"),
            "a",
            F.col("mv.b").alias("b"),
            "k",
            (
                2 * m_lit * (F.col("mv.kub") - F.col("kua"))
                - F.col("k")
                * (
                    F.try_element_at(dmap, F.col("mv.b"))
                    - F.try_element_at(dmap, F.col("a"))
                    + F.col("k")
                )
            ).alias("gain"),
        )
        .where(F.col("gain") > 0)
    )
    rows = (
        moves.select(
            F.explode(F.array("a", "b")).alias("c"),
            F.struct("gain", "node", "b", "k").alias("wk"),
        )
        .groupBy("c")
        .agg(F.max("wk").alias("wk"))
        .collect()  # bounded-collect: <= _K rows (c in the seed domain)
    )
    winner = {
        int(r["c"]): (
            int(r["wk"]["gain"]),
            int(r["wk"]["node"]),
            int(r["wk"]["b"]),
            int(r["wk"]["k"]),
        )
        for r in rows
    }
    kept: dict = {}
    for g, n, b, k in winner.values():
        if n in kept:
            continue
        a = moved.get(n, n % _K)
        wa, wb = winner.get(a), winner.get(b)
        if (
            wa is not None
            and wb is not None
            and (wa[0], wa[1]) == (g, n)
            and (wb[0], wb[1]) == (g, n)
        ):
            kept[n] = (a, b, k)
    return kept


def _local_df(spark, rows, schema):
    """<=_K-row driver-side table as a SINGLE-slice DataFrame: the default
    ``createDataFrame`` parallelizes even 1-row data into
    defaultParallelism slices, so every broadcast build over these tiny
    tables ran a 32-near-empty-task job at local core counts (r16
    profile: five such concurrent jobs, ~2.5 s, all over <=64-row
    inputs)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema=schema
    )


def _q_term(df, m):
    """Shared nano-quantization: ``df`` has one row per community with
    BIGINT columns ``l`` (original intra-edge count, nullable) and
    ``dc`` (summed original degree) — identical double arithmetic and
    parenthesization to ``graph_louvain_pass``'s convention, so any
    derivation that lands the same (l, dc, m) integers yields the same
    q_nano bit-for-bit."""
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    half = d("dc") / (F.lit(2).cast("double") * d("m"))
    t = F.round(
        (F.coalesce("l", F.lit(0)).cast("double") / d("m") - half * half)
        * 1000000000
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(m))
        .select(t.alias("t"))
        .agg(F.sum("t").cast("long").alias("q"))
    )


def _py_degrees(edges: dict) -> dict:
    """Weighted degrees of a coarse graph held as ``{(a, b): w}`` with
    a <= b: non-self edges contribute w to both endpoints, self-loops
    2w — the same convention as the oracle's ``deg_{level}`` CTE."""
    deg: dict = {}
    for (a, b), w in edges.items():
        if a == b:
            deg[a] = deg.get(a, 0) + 2 * w
        else:
            deg[a] = deg.get(a, 0) + w
            deg[b] = deg.get(b, 0) + w
    return deg


def _py_sweep(edges: dict, deg: dict, m_val: int, c: dict):
    """Pure-Python mirror of ``_wsweep`` on a BOUNDED coarse graph.

    Exact-integer arithmetic throughout (the gain formula is all
    int64-range products; Python ints are exact), with the identical
    tie-breaks: best move per node by (gain DESC, b ASC); per-community
    winner by (gain DESC, node DESC); a move kept iff it wins BOTH its
    source and destination community. Returns ``(c_next, n_kept)``.
    """
    adj: dict = {}
    for (a, b), w in edges.items():
        if a != b:
            adj.setdefault(a, {})[b] = adj.get(a, {}).get(b, 0) + w
            adj.setdefault(b, {})[a] = adj.get(b, {}).get(a, 0) + w
    dsum: dict = {}
    for n, cid in c.items():
        dsum[cid] = dsum.get(cid, 0) + deg[n]
    moves = []
    for n, a in c.items():
        kto: dict = {}
        for v, w in adj.get(n, {}).items():
            cv = c[v]
            kto[cv] = kto.get(cv, 0) + w
        kua = kto.get(a, 0)
        k = deg[n]
        best = None
        for b, kub in kto.items():
            if b == a:
                continue
            gain = 2 * m_val * (kub - kua) - k * (dsum[b] - dsum[a] + k)
            if best is None or (-gain, b) < best:
                best = (-gain, b)
        if best is not None and best[0] < 0:
            moves.append((n, a, best[1], -best[0]))
    winner: dict = {}
    for mv in moves:
        n, a, b, g = mv
        for cmy in (a, b):
            cur = winner.get(cmy)
            if cur is None or (g, n) > (cur[3], cur[0]):
                winner[cmy] = mv
    kept = [
        mv
        for mv in moves
        if winner.get(mv[1]) == mv and winner.get(mv[2]) == mv
    ]
    c_next = dict(c)
    for n, _a, b, _g in kept:
        c_next[n] = b
    return c_next, len(kept)


def _py_coarsen(edges: dict, c: dict) -> dict:
    """Coarsen ``{(a, b): w}`` by assignment ``c`` — inter-community
    weights summed, a self-loop row per community carrying its
    intra-weight (total weight conserved), as the oracle's
    ``edges_{level}`` CTE."""
    out: dict = {}
    for (a, b), w in edges.items():
        ca, cb = c[a], c[b]
        key = (ca, cb) if ca <= cb else (cb, ca)
        out[key] = out.get(key, 0) + w
    return out


def _py_ident_rows(edges: dict) -> list:
    """Per-community ``(cid, l, dc)`` integers for the IDENTITY
    partition of a coarse graph (VERDICT r14 #2: identity modularity on
    the graph coarsened by an assignment == composed modularity of that
    assignment on the ORIGINAL graph — self-loop weights carry the
    original intra-edge counts and degrees are conserved through every
    coarsening level). ``l`` is None for communities with no intra
    edges, matching the oracle's LEFT JOIN."""
    deg = _py_degrees(edges)
    sl = {a: w for (a, b), w in edges.items() if a == b}
    return [(int(n), sl.get(n), int(deg[n])) for n in sorted(deg)]


@register(
    "graph_louvain_multilevel",
    oracle=_multilevel_oracle(),
    tags=("graph", "iterative"),
    # headline r14 (the VERDICT r13 #4 policy applied to the round's
    # own heaviest addition): the hierarchy subsumes the one-pass plan
    bench=True,
)
def graph_louvain_multilevel(spark, sf_dir):
    """Full Louvain hierarchy: |E|-scale level-0 sweeps on Spark, then
    a driver-side replay of the bounded deep levels (VERDICT r15 #1b).

    Why the replay is scale-safe: the level-0 community-id domain is
    the seed set {0.._K-1} — moves reassign nodes to EXISTING neighbor
    communities and never mint new ids — so the coarsened graph has
    <= _K nodes and <= _K(_K+1)/2 edge rows BY CONSTRUCTION, regardless
    of corpus size. Collecting it is O(_K^2) bytes (~50 KB at _K=64)
    independent of |E|; replaying levels >= 1 on the driver is exact
    (the sweep's gain/tie-break arithmetic is all integers) and
    eliminates the ~10 sequential checkpoint/count job barriers the
    tiny-table Spark loop paid at ~1-2 s scheduler latency each — the
    r14/r15 residual wall. Modularity keeps the engine's bit-exact
    convention: the replay produces per-community (l, dc) INTEGERS and
    ``_q_term`` performs the nano-quantized double arithmetic in Spark,
    so the q values are unchanged from the all-Spark hierarchy.

    r16 optimization round (guide §1.2, §2.1): the SAME boundedness
    argument extends to every community-side table of the level-0 sweeps
    themselves — assignment overrides, per-community degree sums, winner
    matching are all <= _K entries at any corpus size — so level 0 runs
    as SIX total driver actions over one cached adjacency: materialize
    ``ud`` hash-partitioned by u; one seed-stats pass (per-cid degree
    sums + intra-edge counts + m, <=_K rows); one single-job sweep per
    scheduled sweep (``_sweep_seeded_driver``); one coarsen pass; the
    final output job. The r15 form paid ~15 actions / ~60 AQE stage jobs
    (per-sweep dsum/winner/kept broadcast builds, localCheckpoint
    barriers, count probes) for identical arithmetic.
    """
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    pairs = li.select(
        (F.col("l_suppkey") * 2).alias("u"),
        (F.col("l_partkey") * 2 + 1).alias("v"),
    )
    w1 = F.lit(1).cast("long")
    # Adjacency, both directions, hash-partitioned by u and CACHED: every
    # level-0 job (stats, sweeps, coarsen) is a scan of these blocks, and
    # the explicit repartition("u") lets both sweep aggregations
    # (groupBy(u, cid(v)) and groupBy(u)) reuse the persisted partitioning
    # — zero |E|-scale exchanges after this one (guide §2.4). Edge dedup
    # rides the SAME exchange: dropDuplicates(u, v) after repartition("u")
    # is exchange-free (hash(u) clusters every (u, v) pair), where the old
    # ``.distinct()`` paid its own |E| shuffle before the repartition.
    # The bench/driver clears caches between queries (bench.py session
    # hygiene), matching the connected-components persist discipline.
    ud = (
        pairs.select("u", "v", w1.alias("w"))
        .unionByName(
            pairs.select(
                F.col("v").alias("u"), F.col("u").alias("v"), w1.alias("w")
            )
        )
        .repartition("u")
        .dropDuplicates(["u", "v"])
        .persist()
    )

    # ---- one pass: seed-partition stats, all <=_K rows ----
    # Two-phase: per node (exchange-free on the persisted partitioning)
    # degree k, intra-seed incident weight li; then per seed cid:
    # dc = sum(k), l2 = sum(li) (= 2x intra-edge count — both directions
    # of an intra edge contribute), n = node count; m = total degree / 2.
    # This one job also materializes the ud cache. The node counts let
    # the final sizes be composed ON THE DRIVER (sizes job eliminated).
    cidu = (F.col("u") % _K).cast("long")
    cidv = (F.col("v") % _K).cast("long")
    stats = (
        ud.groupBy("u")
        .agg(
            F.sum("w").cast("long").alias("k"),
            F.sum(F.when(cidu == cidv, F.col("w"))).cast("long").alias("li"),
        )
        .groupBy((F.col("u") % _K).cast("long").alias("cid"))
        .agg(
            F.sum("k").cast("long").alias("dc"),
            F.sum("li").cast("long").alias("l2"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()  # bounded-collect: <= _K rows (seed domain)
    )
    dsum = {int(r["cid"]): int(r["dc"]) for r in stats}
    seedcount = {int(r["cid"]): int(r["n"]) for r in stats}
    seed_rows = [
        (
            int(r["cid"]),
            None if r["l2"] is None else int(r["l2"]) // 2,
            int(r["dc"]),
        )
        for r in stats
    ]
    m_val = sum(dsum.values()) // 2

    # ---- level 0: one single-job sweep per scheduled sweep ----
    moved: dict = {}
    total_moves = 0
    for _ in range(_SWEEPS[0]):
        kept = _sweep_seeded_driver(ud, m_val, moved, dsum)
        total_moves += len(kept)
        if not kept:
            break  # remaining sweeps at this level are exact no-ops
        for n, (a, b, k) in kept.items():
            moved[n] = b
            dsum[a] -= k
            dsum[b] += k

    # ---- bounded coarsen: ONE job, endpoint cids are literal exprs ----
    # each undirected edge appears twice in ud and both rows land on the
    # same (least, greatest) coarse pair — intra edges included — so the
    # aggregated weight is exactly 2x the coarse weight.
    au = _seed_assign_expr("u", moved)
    av = _seed_assign_expr("v", moved)
    g = {}
    for row in (
        ud.groupBy(F.least(au, av).alias("a"), F.greatest(au, av).alias("b"))
        .agg(F.sum("w").cast("long").alias("w2"))
        .collect()  # bounded-collect: <=_K(_K+1)/2 rows by construction (cid domain = seed set; moves never mint ids)
    ):
        g[(int(row["a"]), int(row["b"]))] = int(row["w2"]) // 2

    # ---- levels >= 1: exact driver-side replay (singleton start) ----
    q_tabs = [_py_ident_rows(g)]  # level-0 composed Q off the coarse graph
    fmap = {n: n for n in _py_degrees(g)}  # level-0 cid -> final cid
    for sweeps in _SWEEPS[1:]:
        deg = _py_degrees(g)
        c_l = {n: n for n in deg}
        for _ in range(sweeps):
            c_l, n_kept = _py_sweep(g, deg, m_val, c_l)
            total_moves += n_kept
            if n_kept == 0:
                break  # converged: remaining sweeps are identities
        fmap = {n: c_l[cid] for n, cid in fmap.items()}
        g = _py_coarsen(g, c_l)
        q_tabs.append(_py_ident_rows(g))

    # ---- final output: all inputs are bounded driver-side integers ----
    # sizes are COMPOSED on the driver: a node's final community is
    # fmap[assignment(node)], and assignment differs from the arithmetic
    # seed only on the <=2*_K moved nodes — so per final community,
    # count = sum of unmoved seed counts + moved-node corrections. The
    # q tables are the bounded integer rows collected above; the
    # nano-quantized double arithmetic stays in Spark (_q_term) so q
    # values are bit-identical to the all-Spark hierarchy; m is the
    # collected integer. The output plan is local-relation-only: the
    # |E|-scale work ended at the coarsen job.
    moved_from: dict = {}
    for n in moved:
        c = n % _K
        moved_from[c] = moved_from.get(c, 0) + 1
    sizes_d: dict = {}
    for c, cnt in seedcount.items():
        unmoved = cnt - moved_from.get(c, 0)
        if unmoved:
            f = fmap[c]
            sizes_d[f] = sizes_d.get(f, 0) + unmoved
    for n, b in moved.items():
        f = fmap[b]
        sizes_d[f] = sizes_d.get(f, 0) + 1
    m_df = _local_df(spark, [(int(m_val),)], "m long")
    qs = [
        _q_term(
            _local_df(spark, rows, "cid long, l long, dc long"),
            m_df,
        )
        for rows in q_tabs
    ]
    q_seed = _q_term(
        _local_df(spark, seed_rows, "cid long, l long, dc long"),
        m_df,
    ).select(F.col("q").alias("q_seed_nano"))
    sizes = _local_df(
        spark,
        sorted((int(c), int(n)) for c, n in sizes_d.items()),
        "cid long, n_nodes long",
    )
    out = (
        sizes.withColumn(
            "n_communities", F.lit(len(sizes_d)).cast("long")
        )
        .withColumn("n_moves", F.lit(total_moves).cast("long"))
        .crossJoin(F.broadcast(q_seed))
    )
    for level, q in enumerate(qs):
        out = out.crossJoin(
            F.broadcast(q.select(F.col("q").alias(f"q_l{level}_nano")))
        )
    qcols = [f"q_l{level}_nano" for level in range(len(_SWEEPS))]
    return (
        out.orderBy(F.desc("n_nodes"), "cid")
        .limit(15)
        .select(
            "cid", "n_nodes", "n_communities", "n_moves", "q_seed_nano", *qcols
        )
    )


# --------------------------------------------------------------------------
# Singleton-start Louvain (VERDICT r15 #4): the canonical Blondel et al.
# level-0 pass where EVERY node begins in its own community, so every
# community-side table — degree sums, winner matching, kept moves — is
# O(|V|) and must take plain hash joins. This closes the fidelity gap
# with the standard algorithm (the multilevel hierarchy seeds %_K for
# its boundedness proof) and exercises the one join shape the seeded
# pass never does: community tables that SCALE WITH THE CORPUS. At
# 100 TB nothing here is broadcast or collected; every stage is an
# equi-join or hash aggregation keyed on node/community ids.
# --------------------------------------------------------------------------

_SINGLETON_SWEEPS = 2


def _singleton_oracle() -> str:
    parts = [
        """e AS MATERIALIZED (
  SELECT DISTINCT l_suppkey * 2 AS u, l_partkey * 2 + 1 AS v FROM lineitem
),
m AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS m FROM e)""",
        _sql_level_pre(0, singleton=True),
    ]
    for s in range(_SINGLETON_SWEEPS):
        parts.append(_sql_sweep(0, s))
    final = f"c_0_{_SINGLETON_SWEEPS}"
    parts.append(_sql_q("init", "c_0_0"))
    parts.append(_sql_q("pass", final))
    union = "\n    UNION ALL\n    ".join(
        f"SELECT node FROM kept_0_{s}" for s in range(_SINGLETON_SWEEPS)
    )
    parts.append(
        f"nmv AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS n_moves FROM (\n"
        f"    {union}) zz)"
    )
    parts.append(
        f"""sizes AS MATERIALIZED (
  SELECT cid, cast(count(*) AS BIGINT) AS n_nodes
  FROM {final} GROUP BY cid
),
tot AS MATERIALIZED (SELECT cast(count(*) AS BIGINT) AS n_communities FROM sizes)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT s.cid, s.n_nodes, tot.n_communities, nmv.n_moves,
       q_init.q AS q_init_nano, q_pass.q AS q_pass_nano
FROM sizes s CROSS JOIN tot CROSS JOIN nmv CROSS JOIN q_init CROSS JOIN q_pass
ORDER BY s.n_nodes DESC, s.cid
LIMIT 15
"""


@register(
    "graph_louvain_singleton",
    oracle=_singleton_oracle(),
    tags=("graph", "iterative"),
    # headline r16: the round's heaviest addition (the r13 #4 policy) —
    # and the one headliner whose community tables scale with the corpus
    bench=True,
)
def graph_louvain_singleton(spark, sf_dir):
    """Canonical singleton-start Louvain level-0 pass: final community
    sizes (top 15), total communities, kept moves, and the exact
    nano-quantized modularity before (singleton partition) and after
    the sweeps — all community tables O(|V|), nothing community-sided is
    broadcast-HINTED or collected (AQE may still choose broadcast at toy
    scale and flips to shuffle joins when the tables outgrow the
    threshold; the only scalars on the driver are m and the kept-move
    counts, single values either way).

    r16 optimization round (guide §1.2, §2.4) — same arithmetic, leaner
    plan, measured job-count-bound at local scale:

    * sweep 0 is SPECIALIZED to the singleton identity: the neighbor-
      community table IS the adjacency (b = v, kub = w), the community
      degree-sum table IS the degree table (dcb = deg(v)), kua = 0 and
      dca = deg(node), so gain = 2m*kub - k*dcb with no assignment join
      at all;
    * the winner matching uses two windows over the move table
      (partition by source / destination community) instead of the
      groupBy + join-back pair, which re-ran the whole |E|-scale move
      pipeline inside the broadcast build of the winner table;
    * sweep 1 attaches the post-sweep-0 assignment as
      coalesce(kept_0[x], x) via joins against the O(kept) move table
      instead of materializing a |V|-row assignment table;
    * the adjacency is deduped INSIDE its single repartition("u")
      exchange and cached, so every aggregation keyed on u downstream is
      exchange-free on the persisted partitioning; the degree table is
      cached off it; both kept tables are cached EAGERLY (their counts
      are the n_moves output anyway) so the final assembly's many
      subtrees read blocks instead of racing to recompute lineage.
    """
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    pairs = li.select(
        (F.col("l_suppkey") * 2).alias("u"),
        (F.col("l_partkey") * 2 + 1).alias("v"),
    )
    w1 = F.lit(1).cast("long")
    ud = (
        pairs.select("u", "v", w1.alias("w"))
        .unionByName(
            pairs.select(
                F.col("v").alias("u"), F.col("u").alias("v"), w1.alias("w")
            )
        )
        .repartition("u")
        .dropDuplicates(["u", "v"])
        .persist()
    )
    deg0 = (
        ud.groupBy(F.col("u").alias("node"))
        .agg(F.sum("w").cast("long").alias("k"))
        .persist()
    )
    # one job: materializes the ud + deg0 caches and returns the scalar
    # modularity denominator (sum of degrees = 2m — one row collected)
    m_val = int(
        deg0.groupBy().agg(F.sum("k").cast("long").alias("s")).collect()[0]["s"]  # bounded-collect: one global-aggregate row (the scalar 2m)
        // 2
    )
    m_lit = F.lit(m_val).cast("long")
    m_df = _local_df(spark, [(m_val,)], "m long")

    def _kept_by_windows(moves):
        """Matching identical to the oracle: a move survives iff it is
        the (gain DESC, node DESC) winner of BOTH its source and its
        destination community, where a community's winner ranges over
        ALL its incident moves (source- or destination-side). Explode
        each move into its two incidences, take one window max per
        community, and keep the moves that win both of their rows —
        one linear pipeline (the groupBy + join-back pair re-ran the
        whole |E|-scale move pipeline inside the winner broadcast
        build)."""
        inc = moves.select(
            "node", "b", "gain", F.explode(F.array("a", "b")).alias("c")
        )
        win = F.max(F.struct("gain", "node")).over(Window.partitionBy("c"))
        return (
            inc.withColumn("w", win)
            .where(F.struct("gain", "node") == F.col("w"))
            .groupBy("node")
            .agg(F.first("b").alias("b"), F.count(F.lit(1)).alias("nw"))
            .where(F.col("nw") == 2)
            .select("node", "b")
        )

    # ---- sweep 0, singleton-specialized ----
    g0 = ud.join(
        deg0.select(F.col("node").alias("v"), F.col("k").alias("dcb")), "v"
    ).join(deg0.select(F.col("node").alias("u"), "k"), "u")
    ns0 = -(2 * m_lit * F.col("w") - F.col("k") * F.col("dcb"))
    agg0 = g0.groupBy(F.col("u").alias("node")).agg(
        F.first("k").alias("k"),
        F.min(
            F.struct(
                ns0.alias("ns"),
                F.col("v").alias("b"),
                F.col("w").alias("kub"),
                F.col("dcb").alias("dcb"),
            )
        ).alias("mv"),
    )
    moves0 = agg0.select(
        "node",
        F.col("node").alias("a"),
        F.col("mv.b").alias("b"),
        (2 * m_lit * F.col("mv.kub") - F.col("k") * F.col("mv.dcb")).alias(
            "gain"
        ),
    ).where(F.col("gain") > 0)
    kept0 = _kept_by_windows(moves0).persist()
    n0 = int(kept0.count())

    # ---- sweep 1, assignment attached as coalesce(kept_0[x], x) ----
    k0v = kept0.select(F.col("node").alias("v"), F.col("b").alias("nb"))
    nbr1 = (
        ud.join(k0v, "v", "left")
        .groupBy(
            F.col("u").alias("node"),
            F.coalesce("nb", F.col("v")).alias("b"),
        )
        .agg(F.sum("w").cast("long").alias("kub"))
    )
    dsum1 = (
        deg0.join(kept0, "node", "left")
        .groupBy(F.coalesce("b", F.col("node")).alias("cid"))
        .agg(F.sum("k").cast("long").alias("dc"))
    )
    g1 = (
        nbr1.join(
            dsum1.select(F.col("cid").alias("b"), F.col("dc").alias("dcb")),
            "b",
        )
        .join(deg0, "node")
        .join(kept0.select("node", F.col("b").alias("a0")), "node", "left")
        .withColumn("a", F.coalesce("a0", F.col("node")))
    )
    ns1 = -(2 * m_lit * F.col("kub") - F.col("k") * F.col("dcb"))
    agg1 = g1.groupBy("node").agg(
        F.first("a").alias("a"),
        F.first("k").alias("k"),
        F.max(F.when(F.col("b") == F.col("a"), F.col("kub"))).alias("kua_n"),
        F.min(
            F.when(
                F.col("b") != F.col("a"),
                F.struct(
                    ns1.alias("ns"),
                    F.col("b").alias("b"),
                    F.col("kub").alias("kub"),
                    F.col("dcb").alias("dcb"),
                ),
            )
        ).alias("mv"),
    )
    moves1 = (
        agg1.where(F.col("mv").isNotNull())
        .join(
            dsum1.select(F.col("cid").alias("a"), F.col("dc").alias("dca")),
            "a",
        )
        .select(
            "node",
            "a",
            F.col("mv.b").alias("b"),
            (
                2 * m_lit * (F.col("mv.kub") - F.coalesce("kua_n", F.lit(0)))
                - F.col("k")
                * (F.col("mv.dcb") - F.col("dca") + F.col("k"))
            ).alias("gain"),
        )
        .where(F.col("gain") > 0)
    )
    kept1 = _kept_by_windows(moves1).persist()
    n1 = int(kept1.count())  # eager: the final assembly reads blocks

    # ---- final assembly: ONE action over cached tables ----
    # r17: the composed final assignment coalesce(kept_1[x], kept_0[x], x)
    # is materialized ONCE as cfin (O(|V|) rows — its two kept joins
    # previously re-ran inside every consumer subtree, and lpass attached
    # the assignment with FOUR kept-table joins). Everything below
    # derives from cfin: sizes + q_pass dc off the node table; q_pass l
    # off the adjacency via two cfin joins (intra weight summed over
    # both directions = 2l, exact halving). Same composition, same
    # values. cfin is persisted AND checkpointed: the kept/ud/deg0
    # persists embed their whole producing plans at every reference, and
    # the final assembly references the composition 4x — the nesting
    # compounded to a ~2.2 MB analyzed plan (r17 survey: 50x any other
    # headliner) whose per-run re-analysis dominated the wall. The
    # checkpoint makes every downstream reference a plan LEAF; the
    # persist keeps cfin's canonical plan visible to the cache manager
    # (all its inputs are persisted plans, so re-executions in the same
    # session reuse blocks instead of recomputing the sweeps). The count
    # materializes both in one job.
    cfin = (
        deg0.join(kept0.select("node", F.col("b").alias("b0")), "node", "left")
        .join(kept1.select("node", F.col("b").alias("b1")), "node", "left")
        .select(
            "node", "k", F.coalesce("b1", "b0", F.col("node")).alias("cid")
        )
        .persist()
        .localCheckpoint(eager=False)
    )
    cfin.count()  # bounded one-pass materializer (O(|V|) rows, cached inputs)
    szdc = cfin.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("k").cast("long").alias("dc"),
    )
    lpass = (
        ud.join(
            cfin.select(F.col("node").alias("u"), F.col("cid").alias("cu")),
            "u",
        )
        .join(
            cfin.select(F.col("node").alias("v"), F.col("cid").alias("cv")),
            "v",
        )
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("cid"))
        .agg((F.sum("w").cast("long") / F.lit(2)).cast("long").alias("l"))
    )
    q_pass = _q_term(
        szdc.join(lpass, "cid", "left").select("cid", "l", "dc"), m_df
    ).select(F.col("q").alias("q_pass_nano"))
    # q_init: the singleton partition IS the identity partition of the
    # original graph — per node l = 0 (simple graph), dc = its degree
    q_init = _q_term(
        deg0.select(
            F.lit(None).cast("long").alias("l"), F.col("k").alias("dc")
        ),
        m_df,
    ).select(F.col("q").alias("q_init_nano"))
    sizes = szdc.select("cid", "n_nodes")
    tot = sizes.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_communities")
    )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("n_moves", F.lit(n0 + n1).cast("long"))
        .crossJoin(F.broadcast(q_init))
        .crossJoin(F.broadcast(q_pass))
        .orderBy(F.desc("n_nodes"), "cid")
        .limit(15)
        .select(
            "cid",
            "n_nodes",
            "n_communities",
            "n_moves",
            "q_init_nano",
            "q_pass_nano",
        )
    )
