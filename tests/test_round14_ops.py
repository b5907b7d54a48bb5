"""Round-14 operator pins.

Louvain multilevel: a pure-Python replay of the full deterministic
hierarchy (weighted locally-dominant sweeps + coarsening) must reproduce
the Spark/oracle output exactly at sf0.001 — sizes, move count, and the
nano-quantized per-level modularity trajectory — plus the Q-monotone
pin the r13 verdict prescribed.
"""

from __future__ import annotations

from collections import defaultdict


def _replay_multilevel(edges0):
    """Reference replay of graph_louvain_multilevel on an edge list.

    ``edges0``: iterable of (u, v) distinct undirected edges, no
    self-loops. Returns (sizes: dict cid->n, n_moves, [q_seed, q_l0,
    q_l1, q_l2] in nano units).
    """
    from open_molecule_data_pipeline_spark.operators.louvain import _K, _SWEEPS

    e0 = [(u, v) for u, v in edges0]
    m = len(e0)

    def degrees(edges):
        # weighted degree: non-self edges once per endpoint, self 2w
        deg = defaultdict(int)
        for a, b, w in edges:
            if a == b:
                deg[a] += 2 * w
            else:
                deg[a] += w
                deg[b] += w
        return dict(deg)

    def sweep(edges, deg, c):
        """One locally-dominant weighted move sweep; returns (c', kept)."""
        adj = defaultdict(lambda: defaultdict(int))
        for a, b, w in edges:
            if a != b:
                adj[a][b] += w
                adj[b][a] += w
        dsum = defaultdict(int)
        for n, cid in c.items():
            dsum[cid] += deg[n]
        moves = []
        for n in c:
            kto = defaultdict(int)  # community -> weight from n
            for v, w in adj[n].items():
                kto[c[v]] += w
            a = c[n]
            kua = kto.get(a, 0)
            best = None
            for b, kub in kto.items():
                if b == a:
                    continue
                gain = 2 * m * (kub - kua) - deg[n] * (
                    dsum[b] - dsum[a] + deg[n]
                )
                # argmax by (gain desc, b asc)
                if best is None or gain > best[0] or (
                    gain == best[0] and b < best[1]
                ):
                    best = (gain, b)
            if best is not None and best[0] > 0:
                moves.append((n, a, best[1], best[0]))
        winner = {}
        for n, a, b, g in moves:
            for cmy in (a, b):
                if cmy not in winner or (g, n) > (
                    winner[cmy][3],
                    winner[cmy][0],
                ):
                    winner[cmy] = (n, a, b, g)
        kept = [
            mv
            for mv in moves
            if winner.get(mv[1]) == mv and winner.get(mv[2]) == mv
        ]
        c2 = dict(c)
        for n, _a, b, _g in kept:
            c2[n] = b
        return c2, kept

    def coarsen(edges, c):
        ce = defaultdict(int)
        for a, b, w in edges:
            ca, cb = c[a], c[b]
            ce[(min(ca, cb), max(ca, cb))] += w
        return [(a, b, w) for (a, b), w in ce.items()]

    def q_nano(assign):
        deg0 = degrees([(u, v, 1) for u, v in e0])
        dsum = defaultdict(int)
        for n, cid in assign.items():
            dsum[cid] += deg0[n]
        lc = defaultdict(int)
        for u, v in e0:
            if assign[u] == assign[v]:
                lc[assign[u]] += 1
        total = 0
        for cid, dc in dsum.items():
            half = dc / (2.0 * m)
            t = round((lc.get(cid, 0) / m - half * half) * 1000000000)
            total += int(t)
        return total

    edges = [(u, v, 1) for u, v in e0]
    total_moves = 0
    comp = None
    qs = []
    q_seed = None
    for level, sweeps in enumerate(_SWEEPS):
        deg = degrees(edges)
        if level == 0:
            c = {n: n % _K for n in deg}
            q_seed = q_nano(c)
        else:
            c = {n: n for n in deg}
        for _ in range(sweeps):
            c, kept = sweep(edges, deg, c)
            total_moves += len(kept)
            if not kept:
                break
        comp = dict(c) if level == 0 else {n: c[cid] for n, cid in comp.items()}
        qs.append(q_nano(comp))
        if level + 1 < len(_SWEEPS):
            edges = coarsen(edges, c)
    sizes = defaultdict(int)
    for n, cid in comp.items():
        sizes[cid] += 1
    return dict(sizes), total_moves, [q_seed] + qs


def _lineitem_edges(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    return sorted(
        {(int(s) * 2, int(p) * 2 + 1) for s, p in zip(t.l_suppkey, t.l_partkey)}
    )


def test_louvain_multilevel_matches_python_replay(spark, sf_dir):
    from open_molecule_data_pipeline_spark.operators.louvain import (
        graph_louvain_multilevel,
    )

    rows = graph_louvain_multilevel(spark, sf_dir).collect()
    assert rows, "no communities returned"
    sizes, n_moves, qvals = _replay_multilevel(_lineitem_edges(sf_dir))
    r0 = rows[0]
    assert r0.n_moves == n_moves
    assert r0.n_communities == len(sizes)
    assert [r0.q_seed_nano, r0.q_l0_nano, r0.q_l1_nano, r0.q_l2_nano] == qvals
    # top-15 by (n_nodes desc, cid asc) must match the replay exactly
    expect = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r.cid, r.n_nodes) for r in rows]
    assert got == expect


def test_louvain_multilevel_q_monotone(spark, sf_dir):
    """VERDICT r13 #2 pin: every kept move has strictly positive gain,
    so modularity is non-decreasing across the hierarchy."""
    from open_molecule_data_pipeline_spark.operators.louvain import (
        graph_louvain_multilevel,
    )

    r = graph_louvain_multilevel(spark, sf_dir).collect()[0]
    traj = [r.q_seed_nano, r.q_l0_nano, r.q_l1_nano, r.q_l2_nano]
    assert traj == sorted(traj), traj
    assert r.n_moves > 0  # the fixture graph is not already at fixpoint
    # moves strictly improved Q at level 0
    assert r.q_l0_nano > r.q_seed_nano


def _kn4_replay(docs):
    """Pure-Python interpolated 4-gram KN replay: returns
    {(doc_id, lang): (n_fourgrams, nll_micro)} plus the model tables
    for the hand-pin."""
    import math
    from collections import Counter

    D = 0.75
    fg = []  # (doc_id, lang, 4-gram)
    for doc_id, lang, text in docs:
        t = [w for w in text.split(" ") if w]
        for i in range(len(t) - 3):
            fg.append((doc_id, lang, tuple(t[i : i + 4])))
    four = Counter(g for _, _, g in fg)
    h123 = Counter()
    n123 = Counter()
    for (w1, w2, w3, w4), c in four.items():
        h123[(w1, w2, w3)] += c
        n123[(w1, w2, w3)] += 1
    cont234 = Counter()
    for (w1, w2, w3, w4) in four:
        cont234[(w2, w3, w4)] += 1
    mid23_sum = Counter()
    mid23_n = Counter()
    for (w2, w3, w4), c in cont234.items():
        mid23_sum[(w2, w3)] += c
        mid23_n[(w2, w3)] += 1
    n34 = Counter()
    for (w2, w3, w4) in cont234:
        n34[(w3, w4)] += 1
    mid3_sum = Counter()
    mid3_n = Counter()
    for (w3, w4), c in n34.items():
        mid3_sum[w3] += c
        mid3_n[w3] += 1
    npre4 = Counter()
    for (w3, w4) in n34:
        npre4[w4] += 1
    nbig = len(n34)

    def cost(g):
        w1, w2, w3, w4 = g
        pc = npre4[w4] / nbig
        p2 = (n34[(w3, w4)] - D) / mid3_sum[w3] + D * mid3_n[w3] / mid3_sum[
            w3
        ] * pc
        p3 = (cont234[(w2, w3, w4)] - D) / mid23_sum[(w2, w3)] + D * mid23_n[
            (w2, w3)
        ] / mid23_sum[(w2, w3)] * p2
        p4 = (four[g] - D) / h123[(w1, w2, w3)] + D * n123[
            (w1, w2, w3)
        ] / h123[(w1, w2, w3)] * p3
        return round(-math.log(p4) * 1_000_000)

    per_doc = {}
    for doc_id, lang, g in fg:
        n, s = per_doc.get((doc_id, lang), (0, 0))
        per_doc[(doc_id, lang)] = (n + 1, s + cost(g))
    return per_doc


def test_kn_fourgram_ppl_matches_python_replay(spark, sf_dir):
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.kn_lm import (
        text_kn_fourgram_ppl,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    per_doc = _kn4_replay(
        [(int(r.doc_id), r.lang, r.text) for r in t.itertuples()]
    )
    expect = sorted(
        (
            (n, s, s // n, doc_id, lang)
            for (doc_id, lang), (n, s) in per_doc.items()
        ),
        key=lambda x: (-x[2], x[3]),
    )[:15]
    rows = text_kn_fourgram_ppl(spark, sf_dir).collect()
    got = [
        (r.n_fourgrams, r.nll_micro, r.mean_nll_micro, r.doc_id, r.lang)
        for r in rows
    ]
    assert got == [(n, s, m, d, g) for n, s, m, d, g in expect]


def test_kn_fourgram_backoff_hand_case():
    """Hand-worked chain on a 6-token corpus: 'a b c d' + 'a b c e'
    (one doc each, same lang). For g = (a,b,c,d):
      four=1, c123=2, n123=2 -> top = (1-.75)/2 = .125, lam = .75*2/2 = .75
      cont234[(b,c,d)]=1, mid23[(b,c)] = sum 2, n 2 -> p3 term .125, lam3 .75
      n34[(c,d)]=1, mid3[c] = sum 2, n 2 -> p2 term .125, lam2 .75
      npre4[d]=1, nbig=2 -> pc = .5
      p2 = .125 + .75*.5     = .5
      p3 = .125 + .75*.5     = .5
      p4 = .125 + .75*.5     = .5  -> cost = round(ln(2)*1e6) = 693147
    """
    per_doc = _kn4_replay([(1, "en", "a b c d"), (2, "en", "a b c e")])
    assert per_doc[(1, "en")] == (1, 693147)
    assert per_doc[(2, "en")] == (1, 693147)


def test_semdedup_matches_numpy_replay(spark, sf_dir):
    """SemDeDup replay in float64 numpy: coarse argmin over the 16
    fixed centroids, residual-sign fine split with the integer-ladder
    B, keep-min-id ε-ball rule — exact per-cluster parity."""
    import numpy as np
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.semdedup import (
        _MAX_B,
        _N_COARSE,
        _SEM_TARGET,
        _TAU2,
        dedup_semantic_semdedup,
    )

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    ids = t.vec_id.to_numpy()
    E = np.stack(t.embedding.values).astype(np.float64)
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    Eraw = np.stack(t.embedding.values)[order]  # float32, for sign bits
    cent = E[ids < _N_COARSE]
    cent_ids = ids[ids < _N_COARSE]
    cent_raw = Eraw[ids < _N_COARSE]
    d2 = ((E[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    ca_idx = np.lexsort(
        (cent_ids[None, :].repeat(len(E), 0), d2), axis=1
    )[:, 0]
    m = len(E) // (_N_COARSE * _SEM_TARGET)
    B = m.bit_length() - 1 if m >= 1 else 0
    assign = np.empty(len(E), dtype=np.int64)
    for j in range(len(E)):
        ca = int(cent_ids[ca_idx[j]])
        bucket = 0
        for d in range(B):
            if Eraw[j, d] > cent_raw[ca_idx[j], d]:
                bucket |= 1 << d
        assign[j] = (ca << _MAX_B) + bucket
    n2 = (E * E).sum(axis=1)
    stats = {}
    for cid in np.unique(assign):
        sel = np.where(assign == cid)[0]
        n_rm = 0
        max_cos = None
        for j_i, j in enumerate(sel):
            dup = False
            for i in sel[:j_i]:
                dot = float(E[i] @ E[j])
                cos = dot / np.sqrt(n2[i] * n2[j])
                max_cos = cos if max_cos is None else max(max_cos, cos)
                if dot > 0 and dot * dot >= _TAU2 * (n2[i] * n2[j]):
                    dup = True
            if dup:
                n_rm += 1
        stats[int(cid)] = (
            len(sel),
            n_rm,
            len(sel) - n_rm,
            None if max_cos is None else round(max_cos * 1_000_000),
        )
    rows = dedup_semantic_semdedup(spark, sf_dir).collect()
    got = {
        r.cid: (r.n_members, r.n_removed, r.n_kept, r.max_cos_micro)
        for r in rows
    }
    assert got == stats
    # the fixture must actually exercise the prune path
    assert sum(v[1] for v in stats.values()) > 0


def _one_mcu_s(samp, cb=None):
    """One-MCU color JPEG in the given sampling mode; Y flat, Cb carries
    (dc, ac44), Cr flat — the r13 hand-case fixture generalized."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        _SAMP_GEOM,
        encode_jpeg_color,
    )

    def blk(dc=0, ac44=0):
        b = [0] * 64
        b[0] = dc
        b[4 * 8 + 4] = ac44
        return b

    hy, vy = _SAMP_GEOM[samp]
    yb = [blk() for _ in range(hy * vy)]
    return encode_jpeg_color(
        yb, [blk(*(cb or (0, 0)))], [blk()], 1, 1, samp=samp
    )


def test_jpeg_422_chroma_upsampling_hand_case():
    """4:2:2 replicates chroma HORIZONTALLY only. Cb AC44=2 -> chroma
    amp ±4 (s(x)s(y) sign pattern). Pixels (0,0),(0,1) read chroma
    (0,0) = +4 -> (G,B) = (127,135); (0,2),(0,3) read chroma (0,1) =
    -4 -> (129,121). Vertically FULL-res: pixel (4,0) reads chroma
    (4,0) where s(4)s(0) = + -> 135 again — under 4:2:0 that pixel
    would read chroma row 2 (s(2)s(0) = -) and show 121."""
    from open_molecule_data_pipeline_spark.operators.jpeg import decode_jpeg

    dec = decode_jpeg(_one_mcu_s("422", cb=(0, 2)))
    assert dec["sampling"] == "422"
    assert (dec["width"], dec["height"]) == (16, 8)
    px = dec["pixels"].astype(int)
    for r, c in ((0, 0), (0, 1)):
        assert tuple(px[r, c]) == (128, 127, 135), (r, c, px[r, c])
    for r, c in ((0, 2), (0, 3)):
        assert tuple(px[r, c]) == (128, 129, 121), (r, c, px[r, c])
    assert tuple(px[4, 0]) == (128, 127, 135)
    # chroma plane keeps full vertical resolution: 8 rows x 8 cols
    assert dec["planes"]["cb"].shape == (8, 8)


def test_jpeg_444_chroma_no_upsampling_hand_case():
    """4:4:4 has NO replication: pixel (0,1) reads chroma (0,1) = -4
    -> B=121, where 4:2:0/4:2:2 would read chroma (0,0) and show 135."""
    from open_molecule_data_pipeline_spark.operators.jpeg import decode_jpeg

    dec = decode_jpeg(_one_mcu_s("444", cb=(0, 2)))
    assert dec["sampling"] == "444"
    assert (dec["width"], dec["height"]) == (8, 8)
    px = dec["pixels"].astype(int)
    assert tuple(px[0, 0]) == (128, 127, 135)
    assert tuple(px[0, 1]) == (128, 129, 121)
    assert dec["planes"]["cb"].shape == (8, 8)


def test_jpeg_chroma_modes_roundtrip_planes():
    """Every supported mode round-trips its coefficient planes exactly:
    re-encoding the synth fixture and decoding again reproduces
    identical Y/Cb/Cr planes (the dedup ladder's normalization basis)."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
        synth_chroma_blocks,
    )

    for doc_id in range(6):  # covers each samp x mw combination
        yb, cbb, crb, mw, mh, samp = synth_chroma_blocks(doc_id)
        d1 = decode_jpeg(encode_jpeg_color(yb, cbb, crb, mw, mh, samp=samp))
        d2 = decode_jpeg(encode_jpeg_color(yb, cbb, crb, mw, mh, samp=samp))
        assert d1["sampling"] == samp
        for k in ("y", "cb", "cr"):
            assert np.array_equal(d1["planes"][k], d2["planes"][k])
        assert d1["pixels"].shape == (8 * (2 if doc_id % 3 == 0 else 1),
                                      mw * 8 * (1 if doc_id % 3 == 2 else 2),
                                      3)


def _sos_headers(blob):
    """Parse every SOS header (Ss, Se, Ah, Al) + entropy-slice length."""
    out = []
    pos = 2
    while pos < len(blob) - 1:
        assert blob[pos] == 0xFF
        m = blob[pos + 1]
        pos += 2
        if m == 0xD9:
            break
        seglen = int.from_bytes(blob[pos : pos + 2], "big")
        if m == 0xDA:
            seg = blob[pos + 2 : pos + seglen]
            pos += seglen
            end = pos
            while end < len(blob) - 1:
                if blob[end] == 0xFF and blob[end + 1] != 0x00:
                    break
                end += 1
            ns = seg[0]
            o = 1 + 2 * ns
            out.append(
                (
                    (seg[o], seg[o + 1], seg[o + 2] >> 4, seg[o + 2] & 15),
                    end - pos,
                    ns,
                )
            )
            pos = end
        else:
            pos += seglen
    return out


def test_jpeg_progressive_spectral_selection_hand_pin():
    """The emitted scan script is exactly DC(Al=1) -> DC refine ->
    AC band 1-5 -> AC band 6-63, and scan 3 (the all-zero 1-5 band of
    the fixture) is ONE EOBn symbol: for 20 blocks, EOB4 + 4 extension
    bits = 12 bits -> a 2-byte entropy segment."""
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        _SCAN_SCRIPT,
        encode_jpeg_progressive,
    )

    zb = [[0] * 64 for _ in range(20)]
    blob = encode_jpeg_progressive(zb, 20, 1)
    scans = _sos_headers(blob)
    assert [s[0] for s in scans] == list(_SCAN_SCRIPT)
    # scans 3 and 4 are all-zero bands -> a single 12-bit EOBn each
    assert scans[2][1] == 2 and scans[3][1] == 2, scans


def test_jpeg_progressive_dc_successive_approximation_hand_case():
    """DC=-3: first scan transports -3>>1 = -2, the refinement scan the
    LSB (-3 & 1 = 1); the decoder's (v << 1) | bit reconstruction must
    land on -3 exactly -> flat pixel 128 + 4*(-3) = 116."""
    from open_molecule_data_pipeline_spark.operators.jpeg import decode_jpeg
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive,
    )

    blk = [0] * 64
    blk[0] = -3
    dec = decode_jpeg(encode_jpeg_progressive([blk], 1, 1))
    assert dec["progressive"] and dec["n_scans"] == 4
    assert (dec["pixels"] == 116).all()


def test_jpeg_progressive_zrl_in_band_hand_case():
    """AC(4,4) sits at zigzag 39; in the 6-63 band scan that is 33
    zeros before the value -> two ZRLs + run 1. AC44=-6 with qAC=16
    gives amp 12: corner pixels 128 + dc*4 ± 12."""
    from open_molecule_data_pipeline_spark.operators.jpeg import decode_jpeg
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive,
    )

    blk = [0] * 64
    blk[4 * 8 + 4] = -6
    px = decode_jpeg(encode_jpeg_progressive([blk], 1, 1))["pixels"].astype(int)
    assert px[0, 0] == 128 - 12  # s(0)s(0) = + -> 128 + (-12)
    assert px[0, 2] == 128 + 12  # s(2) flips sign


def test_jpeg_progressive_pair_bytes_differ_pixels_equal():
    """The dedup fixture point: same coefficients through SOF0 vs SOF2
    produce byte-different blobs and identical pixels."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        _prog_renc_blocks,
        encode_jpeg_progressive,
    )

    blocks, bw, bh = _prog_renc_blocks(6)
    b0 = encode_jpeg_baseline(blocks, bw, bh)
    b1 = encode_jpeg_progressive(blocks, bw, bh)
    assert b0 != b1
    assert np.array_equal(decode_jpeg(b0)["pixels"], decode_jpeg(b1)["pixels"])


def test_jpeg_ac_refinement_correction_and_newly_significant_hand_case():
    """One block, AC44 = 3 and AC(0,1) = 1. Al=1 first scans send
    AC44 -> 1 (|3|>>1), AC(0,1) -> 0. The refinement scan must (a)
    append the correction bit to AC44 (3 & 1 = 1 -> magnitude 2 -> 3)
    and (b) NEWLY-SIGNIFY AC(0,1) with a (run,1) code + sign bit.
    Decoded pixels must equal the baseline decode exactly."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive_sa,
    )

    blk = [0] * 64
    blk[4 * 8 + 4] = 3
    blk[1] = 1  # natural (0,1) — zigzag index 1, inside the 1-5 band
    base = decode_jpeg(encode_jpeg_baseline([blk], 1, 1))
    prog = decode_jpeg(encode_jpeg_progressive_sa([blk], 1, 1))
    assert prog["n_scans"] == 6
    assert np.array_equal(base["pixels"], prog["pixels"])


def test_jpeg_ac_refinement_correction_bits_inside_eobrun():
    """Blocks whose band holds ONLY already-significant coefficients
    fold into the refinement EOBRUN with their correction bits buffered
    behind the EOBn symbol — 3 such blocks must still decode exactly."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive_sa,
    )

    blocks = []
    for v in (2, 3, -2):  # |v| >= 2: significant at Al=1, refined at 0
        blk = [0] * 64
        blk[4 * 8 + 4] = v
        blocks.append(blk)
    base = decode_jpeg(encode_jpeg_baseline(blocks, 3, 1))
    prog = decode_jpeg(encode_jpeg_progressive_sa(blocks, 3, 1))
    assert np.array_equal(base["pixels"], prog["pixels"])


def test_jpeg_sa_dense_fuzz_matches_baseline():
    """Deterministic LCG fuzz: dense multi-coefficient blocks through
    the 6-scan SA script decode identically to baseline — ZRL + buffered
    correction interleavings, carried EOBRUNs, negative refinements."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive_sa,
    )

    def prand(seed):
        s = seed
        while True:
            s = (s * 1103515245 + 12345) % (1 << 31)
            yield s

    for trial in range(20):
        g = prand(trial + 7)
        nb = 1 + next(g) % 6
        blocks = []
        for _ in range(nb):
            blk = [0] * 64
            blk[0] = next(g) % 41 - 20
            for _ in range(next(g) % 12):
                blk[1 + next(g) % 63] = next(g) % 31 - 15
            blocks.append(blk)
        b1 = decode_jpeg(encode_jpeg_baseline(blocks, nb, 1))
        b2 = decode_jpeg(encode_jpeg_progressive_sa(blocks, nb, 1))
        assert np.array_equal(b1["pixels"], b2["pixels"]), trial


def test_gopher_repetition_matches_python_replay(spark, sf_dir):
    """Pure-Python Gopher replay: same 2/3-gram duplicate fractions,
    top-coverage, aligned-segment duplicates, thresholds, and exact
    per-language integer means."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.gopher_quality import (
        _SEG,
        _T_DUP2,
        _T_DUP3,
        _T_DUPSEG,
        _T_TOP2,
        _T_TOP3,
        text_gopher_repetition,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()

    def ngram_stats(tk, n):
        grams = [tuple(tk[i : i + n]) for i in range(len(tk) - n + 1)]
        if not grams:
            return 0, 0
        c = Counter(grams)
        dup = sum(v for v in c.values() if v > 1)
        return dup * 1_000_000 // len(grams), max(c.values()) * n * 1_000_000 // len(tk)

    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])  # n, flags, 5 sums
    for r in t.itertuples():
        tk = [w for w in r.text.split(" ") if w]
        d2, t2 = ngram_stats(tk, 2)
        d3, t3 = ngram_stats(tk, 3)
        segs = [
            tuple(tk[_SEG * i : _SEG * i + _SEG])
            for i in range((len(tk) - 1) // _SEG + 1)
            if len(tk[_SEG * i : _SEG * i + _SEG]) == _SEG
        ]
        if segs:
            c = Counter(segs)
            ds = sum(v for v in c.values() if v > 1) * 1_000_000 // len(segs)
        else:
            ds = 0
        flag = int(
            d2 > _T_DUP2 or d3 > _T_DUP3 or t2 > _T_TOP2
            or t3 > _T_TOP3 or ds > _T_DUPSEG
        )
        a = agg[r.lang]
        a[0] += 1
        a[1] += flag
        for i, v in enumerate((d2, t2, d3, t3, ds)):
            a[2 + i] += v
    expect = {
        lang: (
            a[0], a[1],
            a[2] // a[0], a[3] // a[0], a[4] // a[0],
            a[5] // a[0], a[6] // a[0],
        )
        for lang, a in agg.items()
    }
    rows = text_gopher_repetition(spark, sf_dir).collect()
    got = {
        r.lang: (
            r.n_docs, r.n_flagged,
            r.mean_dup2_ppm, r.mean_top2_ppm, r.mean_dup3_ppm,
            r.mean_top3_ppm, r.mean_dupseg_ppm,
        )
        for r in rows
    }
    assert got == expect
    assert sum(v[1] for v in expect.values()) > 0  # thresholds exercised


def test_jpeg_progressive_color_roundtrip_all_modes():
    """Progressive color (interleaved DC + per-component AC rasters +
    successive approximation) decodes identically to baseline color in
    every chroma mode, including multi-MCU images where the luma MCU
    order differs from the component block raster."""
    import numpy as np

    from open_molecule_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
        synth_chroma_blocks,
    )
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive_color,
    )

    saw_multi_mcu = False
    for doc_id in range(12):
        yb, cbb, crb, mw, mh, samp = synth_chroma_blocks(doc_id)
        if mw > 1 and samp == "420":
            saw_multi_mcu = True
            assert yb[0] != yb[len(yb) // mw]  # MCUs carry distinct luma
        base = decode_jpeg(encode_jpeg_color(yb, cbb, crb, mw, mh, samp=samp))
        prog = decode_jpeg(
            encode_jpeg_progressive_color(yb, cbb, crb, mw, mh, samp=samp)
        )
        assert prog["progressive"] and prog["n_scans"] == 8
        assert prog["sampling"] == samp
        assert np.array_equal(base["pixels"], prog["pixels"]), (doc_id, samp)
        for k in ("y", "cb", "cr"):
            assert np.array_equal(base["planes"][k], prog["planes"][k])
    assert saw_multi_mcu


def test_jpeg_progressive_color_scan_structure():
    """The 8-scan script: two interleaved (ns=3) DC scans — Al=1 then
    the Ah=1 refinement — followed by six non-interleaved (ns=1) AC
    band 1-63 scans, first at Al=1 then refined to Al=0."""
    from open_molecule_data_pipeline_spark.operators.jpeg import (
        synth_chroma_blocks,
    )
    from open_molecule_data_pipeline_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive_color,
    )

    yb, cbb, crb, mw, mh, samp = synth_chroma_blocks(0)
    scans = _sos_headers(
        encode_jpeg_progressive_color(yb, cbb, crb, mw, mh, samp=samp)
    )
    assert len(scans) == 8
    assert [s[2] for s in scans] == [3, 3, 1, 1, 1, 1, 1, 1]
    assert [s[0] for s in scans[:2]] == [(0, 0, 0, 1), (0, 0, 1, 0)]
    assert all(s[0] == (1, 63, 0, 1) for s in scans[2:5])
    assert all(s[0] == (1, 63, 1, 0) for s in scans[5:8])


def _kn5_replay(docs):
    """Pure-Python interpolated 5-gram KN replay:
    {(doc_id, lang): (n_fivegrams, nll_micro)}."""
    import math
    from collections import Counter

    D = 0.75
    pg = []
    for doc_id, lang, text in docs:
        t = [w for w in text.split(" ") if w]
        for i in range(len(t) - 4):
            pg.append((doc_id, lang, tuple(t[i : i + 5])))
    five = Counter(g for _, _, g in pg)
    h1234, n1234 = Counter(), Counter()
    for (w1, w2, w3, w4, w5), c in five.items():
        h1234[(w1, w2, w3, w4)] += c
        n1234[(w1, w2, w3, w4)] += 1
    cont2345 = Counter(g[1:] for g in five)
    mid234_s, mid234_n = Counter(), Counter()
    for (w2, w3, w4, w5), c in cont2345.items():
        mid234_s[(w2, w3, w4)] += c
        mid234_n[(w2, w3, w4)] += 1
    n345 = Counter(g[1:] for g in cont2345)
    mid34_s, mid34_n = Counter(), Counter()
    for (w3, w4, w5), c in n345.items():
        mid34_s[(w3, w4)] += c
        mid34_n[(w3, w4)] += 1
    n45 = Counter(g[1:] for g in n345)
    mid4_s, mid4_n = Counter(), Counter()
    for (w4, w5), c in n45.items():
        mid4_s[w4] += c
        mid4_n[w4] += 1
    npre5 = Counter(g[1] for g in n45)
    nbig = len(n45)

    def cost(g):
        w1, w2, w3, w4, w5 = g
        pc = npre5[w5] / nbig
        p2 = (n45[(w4, w5)] - D) / mid4_s[w4] + D * mid4_n[w4] / mid4_s[
            w4
        ] * pc
        p3 = (n345[(w3, w4, w5)] - D) / mid34_s[(w3, w4)] + D * mid34_n[
            (w3, w4)
        ] / mid34_s[(w3, w4)] * p2
        p4 = (cont2345[g[1:]] - D) / mid234_s[(w2, w3, w4)] + D * mid234_n[
            (w2, w3, w4)
        ] / mid234_s[(w2, w3, w4)] * p3
        p5 = (five[g] - D) / h1234[g[:4]] + D * n1234[g[:4]] / h1234[
            g[:4]
        ] * p4
        return round(-math.log(p5) * 1_000_000)

    per_doc = {}
    for doc_id, lang, g in pg:
        n, s = per_doc.get((doc_id, lang), (0, 0))
        per_doc[(doc_id, lang)] = (n + 1, s + cost(g))
    return per_doc


def test_kn_fivegram_ppl_matches_python_replay(spark, sf_dir):
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.kn_lm import (
        text_kn_fivegram_ppl,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    per_doc = _kn5_replay(
        [(int(r.doc_id), r.lang, r.text) for r in t.itertuples()]
    )
    expect = sorted(
        (
            (n, s, s // n, doc_id, lang)
            for (doc_id, lang), (n, s) in per_doc.items()
        ),
        key=lambda x: (-x[2], x[3]),
    )[:15]
    rows = text_kn_fivegram_ppl(spark, sf_dir).collect()
    got = [
        (r.n_fivegrams, r.nll_micro, r.mean_nll_micro, r.doc_id, r.lang)
        for r in rows
    ]
    assert got == [(n, s, m, d, g) for n, s, m, d, g in expect]


def test_kn_fivegram_backoff_hand_case():
    """Hand-worked 5-level chain on 'a b c d e' + 'a b c d f': every
    level's counts are (1 vs 2, types 2), so each interpolation step is
    0.125 + 0.75 * 0.5 = 0.5 down from Pc = 0.5 — P = 1/2 and
    cost = round(ln(2) * 1e6) = 693147 for both docs."""
    per_doc = _kn5_replay([(1, "en", "a b c d e"), (2, "en", "a b c d f")])
    assert per_doc[(1, "en")] == (1, 693147)
    assert per_doc[(2, "en")] == (1, 693147)


def test_jl_projection_recall_matches_numpy_replay(spark, sf_dir):
    """Numpy replay: identical md5-seeded sign matrix, projected and
    exact cosine top-5 with (score desc, vec_id) tie-break, per-query
    overlap — exact parity, and the sketch is neither perfect nor
    useless on the fixture (0 < mean recall < 1)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.jl_projection import (
        _EMB_DIMS,
        _JL_DIMS,
        _N_QUERIES,
        _TOP_K,
        sim_jl_projection_recall,
    )

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    ids = t.vec_id.to_numpy()
    E = np.stack(t.embedding.values).astype(np.float64)
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    S = np.array(
        [
            [
                1
                if hashlib.md5(f"jl-{j}-{d}".encode()).hexdigest()[0]
                in "01234567"
                else -1
                for d in range(_EMB_DIMS)
            ]
            for j in range(_JL_DIMS)
        ],
        dtype=np.float64,
    )
    P = E @ S.T

    def top5(M, qrow):
        scores = M @ M[qrow] / (
            np.sqrt((M * M).sum(1)) * np.sqrt((M[qrow] ** 2).sum())
        )
        cand = [
            (-scores[j], ids[j]) for j in range(len(M)) if ids[j] != ids[qrow]
        ]
        cand.sort()
        return {vid for _, vid in cand[:_TOP_K]}

    expect = {}
    for qrow in range(len(ids)):
        if ids[qrow] >= _N_QUERIES:
            continue
        n_hit = len(top5(E, qrow) & top5(P, qrow))
        expect[int(ids[qrow])] = (n_hit, n_hit * 1_000_000 // _TOP_K)
    rows = sim_jl_projection_recall(spark, sf_dir).collect()
    got = {r.qid: (r.n_hit, r.recall_ppm) for r in rows}
    assert got == expect
    mean = sum(v[0] for v in expect.values()) / (len(expect) * _TOP_K)
    assert 0.0 < mean < 1.0, mean


def test_vocab_drift_js_matches_python_replay(spark, sf_dir):
    """Pure-Python JS replay: same md5 doc split, same rational ln
    arguments, same nano quantization — exact per-language parity, and
    the fixture split produces nonzero drift (JS > 0, < ln 2)."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from open_molecule_data_pipeline_spark.operators.vocab_drift import (
        text_vocab_drift_js,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    ca, cb = defaultdict(Counter), defaultdict(Counter)
    for r in t.itertuples():
        in_a = hashlib.md5(str(int(r.doc_id)).encode()).hexdigest()[31] < "8"
        side = ca if in_a else cb
        for w in r.text.split(" "):
            if w:
                side[r.lang][w] += 1
    expect = {}
    for lang in set(ca) | set(cb):
        na = sum(ca[lang].values())
        nb = sum(cb[lang].values())
        js = 0
        top = None
        for tok in set(ca[lang]) | set(cb[lang]):
            a, b = ca[lang][tok], cb[lang][tok]
            c = 0.0
            if a > 0:
                c += 0.5 * (a / na) * math.log(
                    (2 * float(a) * nb) / (float(a) * nb + float(b) * na)
                )
            if b > 0:
                c += 0.5 * (b / nb) * math.log(
                    (2 * float(b) * na) / (float(a) * nb + float(b) * na)
                )
            cn = round(c * 1_000_000_000)
            js += cn
            if top is None or (-cn, tok) < top:
                top = (-cn, tok)
        expect[lang] = (
            na, nb,
            len(ca[lang]), len(cb[lang]),
            js, top[1], -top[0],
        )
    rows = text_vocab_drift_js(spark, sf_dir).collect()
    got = {
        r.lang: (
            r.tokens_a, r.tokens_b, r.vocab_a, r.vocab_b,
            r.js_nano, r.top_drift_token, r.top_drift_nano,
        )
        for r in rows
    }
    assert got == expect
    for lang, v in expect.items():
        assert 0 < v[4] < round(math.log(2) * 1e9), (lang, v[4])
