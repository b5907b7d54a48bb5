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


def _wsweep(ud, deg, m, c, probe=True, bounded=True):
    """One weighted locally-dominant move sweep.

    Returns ``(c_next, n_kept)``; both sides of the matching constraint
    (a community may be the source OR destination of at most one kept
    move per sweep) are enforced exactly as the proven r13 pass. The
    kept table is checkpointed before counting so the convergence probe
    is a <=|communities|-row scan, not a plan re-execution. With
    ``probe=False`` (the LAST scheduled sweep, where no early exit can
    save anything) the checkpoint is LAZY and ``n_kept`` is returned as
    the kept DataFrame instead: the next action that touches c_next —
    the coarsen collect — materializes the sweep as part of its own job,
    saving one full scheduler round-trip at |E| scale.

    Plan shape (r16 flattening): for a FIXED node, gain(b) =
    2m*kub - k*dcb + const(node) where const = -2m*kua + dca*k - k^2,
    so the per-node argmax over candidate communities — including its
    ties, hence the min-b tie-break — is decided by s = 2m*kub - k*dcb
    alone. That lets one struct-min aggregation pick the best candidate
    straight off the nbr rows (no own/cand join chain re-shuffling the
    candidate stream), and the true gain is reconstructed AFTER the
    aggregation from (kua, dca) for the >0 filter. Joins with c/deg are
    all on ``node`` — one exchange feeds the joins and the groupBy.
    Verified equal (full assignment sets, both sweeps) to the r13 join
    formulation at sf0.1.
    """
    # community-scale tables (dsum, winner, kept) are broadcast ONLY
    # when the caller proves them bounded (the %_K-seeded multilevel
    # pass: <= _K rows by construction). At singleton start they are
    # O(|V|) and take plain hash joins (bounded=False).
    hb = F.broadcast if bounded else (lambda df: df)
    dsum = (
        c.join(deg, "node")
        .groupBy("cid")
        .agg(F.sum("k").cast("long").alias("dc"))
    )
    nbr = (
        ud.join(
            c.select(F.col("node").alias("v"), F.col("cid").alias("b")), "v"
        )
        .groupBy(F.col("u").alias("node"), "b")
        .agg(F.sum("w").cast("long").alias("kub"))
    )
    g = (
        nbr.join(
            hb(
                dsum.select(F.col("cid").alias("b"), F.col("dc").alias("dcb"))
            ),
            "b",
        )
        .join(c.select("node", F.col("cid").alias("a")), "node")
        .join(deg, "node")
        .crossJoin(F.broadcast(m))
    )
    ns = -(2 * F.col("m") * F.col("kub") - F.col("k") * F.col("dcb"))
    agg = g.groupBy("node").agg(
        F.first("a").alias("a"),
        F.first("k").alias("k"),
        F.first("m").alias("m"),
        F.max(F.when(F.col("b") == F.col("a"), F.col("kub"))).alias("kua_n"),
        F.min(
            F.when(
                F.col("b") != F.col("a"),
                F.struct(
                    ns.alias("ns"),
                    F.col("b").alias("b"),
                    F.col("kub").alias("kub"),
                    F.col("dcb").alias("dcb"),
                ),
            )
        ).alias("mv"),
    )
    moves = (
        agg.where(F.col("mv").isNotNull())
        .join(
            hb(
                dsum.select(F.col("cid").alias("a"), F.col("dc").alias("dca"))
            ),
            "a",
        )
        .select(
            "node",
            "a",
            F.col("mv.b").alias("b"),
            (
                2
                * F.col("m")
                * (F.col("mv.kub") - F.coalesce("kua_n", F.lit(0)))
                - F.col("k")
                * (F.col("mv.dcb") - F.col("dca") + F.col("k"))
            ).alias("gain"),
        )
        .where(F.col("gain") > 0)
    )
    incident = moves.select(F.col("a").alias("c"), "gain", "node").unionByName(
        moves.select(F.col("b").alias("c"), "gain", "node")
    )
    winner = incident.groupBy("c").agg(
        F.max(F.struct("gain", "node")).alias("wkey")
    )
    kept = (
        moves.join(
            hb(
                winner.select(F.col("c").alias("a"), F.col("wkey").alias("wa"))
            ),
            "a",
        )
        .join(
            hb(
                winner.select(F.col("c").alias("b"), F.col("wkey").alias("wb"))
            ),
            "b",
        )
        .where(
            (F.struct("gain", "node") == F.col("wa"))
            & (F.struct("gain", "node") == F.col("wb"))
        )
        .select("node", "b")
        .localCheckpoint(eager=probe)
    )
    n_kept = kept.count() if probe else kept
    # c_next stays LAZY: with kept checkpointed (<=|communities| rows,
    # broadcast), re-deriving the assignment is a degree-table scan plus
    # broadcast joins — cheaper than materializing |V| rows per sweep.
    c_next = c.join(hb(kept), "node", "left").select(
        "node", F.coalesce("b", F.col("cid")).alias("cid")
    )
    return c_next, n_kept


def _attach_seeded_cid(df, col, kepts, out):
    """Attach the CURRENT seeded-level-0 community id of node column
    ``col`` as ``out`` — map-side (r16 optimization round, guide §2.4).

    At the %_K seed, the assignment after s sweeps is
    ``coalesce(kept_{s-1}[x], ..., kept_0[x], x % _K)``: each sweep's kept
    table holds <= _K rows (a community is the source OR destination of at
    most one kept move per sweep), so the whole assignment is a chain of
    bounded broadcast lookups over an arithmetic seed — the |E|-scale
    ud x assignment equi-join and the |V|-scale c-table the generic sweep
    pays are never materialized at all."""
    cur = df
    tmps = []
    for i, kp in enumerate(kepts):
        t = f"__k{i}_{out}"
        cur = cur.join(
            F.broadcast(
                kp.select(F.col("node").alias(col), F.col("b").alias(t))
            ),
            col,
            "left",
        )
        tmps.append(t)
    seed = (F.col(col) % _K).cast("long")
    expr = F.coalesce(*[F.col(t) for t in reversed(tmps)], seed) if tmps else seed
    return cur.withColumn(out, expr).drop(*tmps)


def _wsweep_seeded(ud, deg, m, kepts, probe=True):
    """One weighted move sweep of the %_K-seeded level 0, with the
    assignment attached map-side via ``_attach_seeded_cid`` instead of
    distributed joins (r16 optimization round).

    Identical arithmetic and tie-breaks to ``_wsweep`` (same ns-struct
    argmin, same winner matching); only the *plan* differs: per sweep the
    only non-broadcast exchanges are the nbr groupBy(u, b) partial
    aggregation and one re-exchange of the aggregated nbr stream by node
    — versus the generic sweep's ~6 |E|/|V|-scale exchanges. Returns
    ``(kept, n_kept)`` with the same probe discipline as ``_wsweep``
    (``probe=False`` defers checkpoint+count into the next job)."""
    dsum = (
        _attach_seeded_cid(deg, "node", kepts, "cid")
        .groupBy("cid")
        .agg(F.sum("k").cast("long").alias("dc"))
    )
    nbr = (
        _attach_seeded_cid(ud, "v", kepts, "b")
        .groupBy(F.col("u").alias("node"), "b")
        .agg(F.sum("w").cast("long").alias("kub"))
    )
    g = _attach_seeded_cid(
        nbr.join(
            F.broadcast(
                dsum.select(F.col("cid").alias("b"), F.col("dc").alias("dcb"))
            ),
            "b",
        )
        .join(deg, "node")
        .crossJoin(F.broadcast(m)),
        "node",
        kepts,
        "a",
    )
    ns = -(2 * F.col("m") * F.col("kub") - F.col("k") * F.col("dcb"))
    agg = g.groupBy("node").agg(
        F.first("a").alias("a"),
        F.first("k").alias("k"),
        F.first("m").alias("m"),
        F.max(F.when(F.col("b") == F.col("a"), F.col("kub"))).alias("kua_n"),
        F.min(
            F.when(
                F.col("b") != F.col("a"),
                F.struct(
                    ns.alias("ns"),
                    F.col("b").alias("b"),
                    F.col("kub").alias("kub"),
                    F.col("dcb").alias("dcb"),
                ),
            )
        ).alias("mv"),
    )
    moves = (
        agg.where(F.col("mv").isNotNull())
        .join(
            F.broadcast(
                dsum.select(F.col("cid").alias("a"), F.col("dc").alias("dca"))
            ),
            "a",
        )
        .select(
            "node",
            "a",
            F.col("mv.b").alias("b"),
            (
                2
                * F.col("m")
                * (F.col("mv.kub") - F.coalesce("kua_n", F.lit(0)))
                - F.col("k")
                * (F.col("mv.dcb") - F.col("dca") + F.col("k"))
            ).alias("gain"),
        )
        .where(F.col("gain") > 0)
    )
    incident = moves.select(F.col("a").alias("c"), "gain", "node").unionByName(
        moves.select(F.col("b").alias("c"), "gain", "node")
    )
    winner = incident.groupBy("c").agg(
        F.max(F.struct("gain", "node")).alias("wkey")
    )
    kept = (
        moves.join(
            F.broadcast(
                winner.select(F.col("c").alias("a"), F.col("wkey").alias("wa"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                winner.select(F.col("c").alias("b"), F.col("wkey").alias("wb"))
            ),
            "b",
        )
        .where(
            (F.struct("gain", "node") == F.col("wa"))
            & (F.struct("gain", "node") == F.col("wb"))
        )
        .select("node", "b")
        .localCheckpoint(eager=probe)
    )
    n_kept = kept.count() if probe else None
    return kept, n_kept


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


def _q_seed(e, deg0, m):
    """Modularity of the hash-seed partition (node % _K) — ZERO joins:
    the seed community of each endpoint is arithmetic on the edge row
    itself, so l is one filtered scan of the checkpointed edge table
    and dc one scan of the checkpointed degree table (the old path
    joined the |E| edge table against the assignment twice)."""
    lc = (
        e.where((F.col("u") % _K) == (F.col("v") % _K))
        .groupBy((F.col("u") % _K).alias("cid"))
        .agg(F.count(F.lit(1)).cast("long").alias("l"))
    )
    ds = deg0.groupBy((F.col("node") % _K).alias("cid")).agg(
        F.sum("k").cast("long").alias("dc")
    )
    return _q_term(ds.join(F.broadcast(lc), "cid", "left"), m)


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
    """
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    e = (
        li.select(
            (F.col("l_suppkey") * 2).alias("u"),
            (F.col("l_partkey") * 2 + 1).alias("v"),
        )
        .distinct()
        # LAZY: deg0's eager checkpoint below reads e, materializing
        # both tables in ONE job instead of two scheduler round-trips.
        .localCheckpoint(eager=False)
    )
    m = e.groupBy().agg(F.count(F.lit(1)).cast("long").alias("m"))
    edges = e.select(
        F.col("u").alias("a"),
        F.col("v").alias("b"),
        F.lit(1).cast("long").alias("w"),
    )

    # ---- level 0: the proven |E|-scale weighted pass, seeded form ----
    # r16 optimization round: the %_K-seeded assignment after s sweeps is
    # coalesce(kept_{s-1}[x], ..., kept_0[x], x % _K) — every kept table
    # is <= _K rows — so sweeps, coarsen and sizes all attach the
    # assignment MAP-SIDE (broadcast lookups over an arithmetic seed)
    # instead of joining a |V|-row c table against the |E|-row adjacency.
    ud = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w"
    ).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    )
    deg0 = (
        ud.groupBy(F.col("u").alias("node"))
        .agg(F.sum("w").cast("long").alias("k"))
        .localCheckpoint(eager=True)
    )
    total_moves = 0
    kepts: list = []
    last_kept = None  # lazily-checkpointed kept of the final sweep
    for i in range(_SWEEPS[0]):
        if i < _SWEEPS[0] - 1:
            kept, n_kept = _wsweep_seeded(ud, deg0, m, kepts)
            kepts.append(kept)
            total_moves += n_kept
            if n_kept == 0:
                break  # remaining sweeps at this level are no-ops
        else:
            # final scheduled sweep: no early exit is possible after
            # it, so defer both checkpoint and count to the coarsen job
            last_kept, _ = _wsweep_seeded(ud, deg0, m, kepts, probe=False)
            kepts.append(last_kept)

    # ---- bounded coarsen: ONE |E|-scale job, collects <= _K nodes ----
    # endpoint cids attached map-side (broadcast kept chain), so the whole
    # coarsen is one scan + one bounded-output aggregation — the previous
    # form paid two |E|-row hash joins against the assignment table.
    g = {}
    for row in (
        _attach_seeded_cid(
            _attach_seeded_cid(edges, "a", kepts, "ca"), "b", kepts, "cb"
        )
        .select(
            F.least("ca", "cb").alias("a"),
            F.greatest("ca", "cb").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").cast("long").alias("w"))
        .collect()  # bounded-collect: <=_K(_K+1)/2+_K rows by construction (cid domain = seed set; moves never mint ids)
    ):
        g[(int(row["a"]), int(row["b"]))] = int(row["w"])
    if last_kept is not None:
        # materialized by the coarsen job above; this reads its cached
        # <=_K-row blocks, not a plan re-execution
        total_moves += last_kept.count()
    # weight is conserved through coarsening, so 2m's edge total is the
    # coarse weight sum — no extra count job for the replay's m.
    m_val = sum(g.values())

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

    map_df = spark.createDataFrame(
        sorted((int(k), int(v)) for k, v in fmap.items()),
        schema="cid long, nc long",
    )
    # level-0 composed assignment, attached map-side from the kept chain
    comp = _attach_seeded_cid(deg0.select("node"), "node", kepts, "cid")
    comp = comp.join(F.broadcast(map_df), "cid").select(
        "node", F.col("nc").alias("cid")
    )
    qs = [
        _q_term(
            spark.createDataFrame(rows, schema="cid long, l long, dc long"),
            m,
        )
        for rows in q_tabs
    ]

    q_seed = _q_seed(e, deg0, m).select(F.col("q").alias("q_seed_nano"))
    sizes = comp.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    tot = sizes.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_communities")
    )
    out = (
        sizes.crossJoin(F.broadcast(tot))
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


def _q_ident_dist(edges, m):
    """Identity-partition modularity of a weighted graph whose node
    count may be O(|V|) — the DISTRIBUTED twin of ``_py_ident_rows``
    (plain joins, nothing broadcast or collected): per node, ``l`` is
    its self-loop weight and ``dc`` its weighted degree, fed to the
    shared ``_q_term`` nano-quantization."""
    nonself = edges.where(F.col("a") != F.col("b"))
    deg = (
        nonself.select(F.col("a").alias("node"), F.col("w").alias("kc"))
        .unionByName(
            nonself.select(F.col("b").alias("node"), F.col("w").alias("kc"))
        )
        .unionByName(
            edges.where(F.col("a") == F.col("b")).select(
                F.col("a").alias("node"), (2 * F.col("w")).alias("kc")
            )
        )
        .groupBy("node")
        .agg(F.sum("kc").cast("long").alias("dc"))
    )
    sl = edges.where(F.col("a") == F.col("b")).select(
        F.col("a").alias("node"), F.col("w").cast("long").alias("l")
    )
    return _q_term(deg.join(sl, "node", "left"), m)


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
    the sweeps — all community tables O(|V|), all joins hash joins
    (``bounded=False``)."""
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    e = (
        li.select(
            (F.col("l_suppkey") * 2).alias("u"),
            (F.col("l_partkey") * 2 + 1).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    m = e.groupBy().agg(F.count(F.lit(1)).cast("long").alias("m"))
    edges = e.select(
        F.col("u").alias("a"),
        F.col("v").alias("b"),
        F.lit(1).cast("long").alias("w"),
    )
    ud = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w"
    ).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    )
    deg0 = (
        ud.groupBy(F.col("u").alias("node"))
        .agg(F.sum("w").cast("long").alias("k"))
        .localCheckpoint(eager=True)
    )
    c = deg0.select("node", F.col("node").alias("cid"))
    total_moves = 0
    last_kept = None
    for s in range(_SINGLETON_SWEEPS):
        last = s == _SINGLETON_SWEEPS - 1
        c, n_kept = _wsweep(ud, deg0, m, c, probe=not last, bounded=False)
        if last:
            # the LAST sweep's convergence count can save nothing (no
            # sweep follows), so its checkpoint+count barrier is
            # deferred into the final job: n_kept is the kept DataFrame
            # and its count lands in the n_moves column in-plan (the
            # multilevel probe=False discipline, O(|V|)-sized here)
            last_kept = n_kept
        else:
            total_moves += n_kept
            if n_kept == 0:
                break  # converged: remaining sweeps are exact no-ops
    # q_init: the singleton partition IS the identity partition of the
    # original graph — per node l = 0 (simple graph), dc = its degree
    q_init = _q_term(
        deg0.select(
            F.lit(None).cast("long").alias("l"), F.col("k").alias("dc")
        ),
        m,
    ).select(F.col("q").alias("q_init_nano"))
    # q_pass: identity modularity of the graph coarsened by the final
    # assignment == composed modularity on the original graph; the
    # coarse graph here is O(|V|) nodes, so it STAYS DISTRIBUTED
    pa = c.select(F.col("node").alias("a"), F.col("cid").alias("ca"))
    pb = c.select(F.col("node").alias("b"), F.col("cid").alias("cb"))
    coarse = (
        edges.join(pa, "a")
        .join(pb, "b")
        .select(
            F.least("ca", "cb").alias("a"),
            F.greatest("ca", "cb").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    q_pass = _q_ident_dist(coarse, m).select(F.col("q").alias("q_pass_nano"))
    sizes = c.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    tot = sizes.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_communities")
    )
    if last_kept is not None:
        nmv = last_kept.groupBy().agg(
            (F.count(F.lit(1)) + F.lit(total_moves))
            .cast("long")
            .alias("n_moves")
        )
    else:
        nmv = spark.range(1).select(
            F.lit(total_moves).cast("long").alias("n_moves")
        )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nmv))
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
