"""Equivalence guards for the round-12 optimization restructures.

Each optimized operator changed its PHYSICAL shape only (single-pass window
chains, cell-table algebra, checkpointed shared subplans); these tests pin
the LOGICAL results against straightforward reference computations so a
future refactor can't silently change semantics while chasing plans. The
full DuckDB oracle mirror (test_past_window_mirror) also covers these gates;
here the references are independent pure-Python recomputations on small
adversarial fixtures (ties, duplicates, degenerate groups).
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _avg_ranks(values):
    """Tie-averaged ranks (scipy.stats.rankdata 'average')."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_bitext_margin_pairs_matches_bruteforce(spark):
    """The single-pass window restructure must reproduce the margin rule
    exactly: rounded cosine, rounded top-k sums, mutual argmax."""
    import random

    from stackstac_spark.operators.similarity import bitext_margin_pairs

    rng = random.Random(7)
    dim = 8
    rows = [
        (i, i % 2, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    src = df.filter("label % 2 = 0")
    tgt = df.filter("label % 2 = 1")
    knn, thr = 3, 0.0
    got = {
        (r["src_id"], r["tgt_id"]): (r["sim"], r["margin"])
        for r in bitext_margin_pairs(src, tgt, knn=knn, threshold=thr).collect()
    }

    # brute-force reference
    svecs = {i: v for i, lab, v in rows if lab % 2 == 0}
    tvecs = {i: v for i, lab, v in rows if lab % 2 == 1}
    sims = {}
    for si, sv in svecs.items():
        sn = math.sqrt(sum(x * x for x in sv))
        for ti, tv in tvecs.items():
            tn = math.sqrt(sum(x * x for x in tv))
            dot = sum(a * b for a, b in zip(sv, tv))
            sims[(si, ti)] = round(dot / (sn * tn), 6)
    sum_s = {
        si: round(
            sum(sorted((sims[(si, ti)] for ti in tvecs), reverse=True)[:knn]), 6
        )
        for si in svecs
    }
    sum_t = {
        ti: round(
            sum(sorted((sims[(si, ti)] for si in svecs), reverse=True)[:knn]), 6
        )
        for ti in tvecs
    }
    margin = {
        (si, ti): round(s / ((sum_s[si] + sum_t[ti]) / (2.0 * knn)), 6)
        for (si, ti), s in sims.items()
    }
    expected = {}
    for si in svecs:
        # forward argmax: max margin, tie -> smaller tgt_id
        ti = min(tvecs, key=lambda t: (-margin[(si, t)], t))
        # backward argmax for that tgt
        si_b = min(svecs, key=lambda s: (-margin[(s, ti)], s))
        if si_b == si and margin[(si, ti)] >= thr:
            expected[(si, ti)] = (sims[(si, ti)], margin[(si, ti)])
    assert got == expected


def test_spearman_cells_restructure_matches_reference(spark):
    from stackstac_spark.operators.drift import spearman_rho

    rows = [
        ("g1", 1.0, 2.0), ("g1", 1.0, 2.0), ("g1", 3.0, 1.0), ("g1", 2.0, 5.0),
        ("g1", 2.0, 5.0), ("g1", 4.0, 4.0),
        ("g2", 1.0, 1.0), ("g2", 2.0, 2.0), ("g2", 3.0, 3.0),
        ("g3", 7.0, 1.0), ("g3", 7.0, 2.0),  # constant a -> rho NULL
    ]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    got = {r["g"]: (r["n"], r["rho"]) for r in spearman_rho(df, "a", "b", ["g"]).collect()}

    for g in ("g1", "g2", "g3"):
        xs = [a for gg, a, b in rows if gg == g]
        ys = [b for gg, a, b in rows if gg == g]
        ra, rb = _avg_ranks(xs), _avg_ranks(ys)
        n = len(xs)
        sx, sy = sum(ra), sum(rb)
        sxx = sum(r * r for r in ra)
        syy = sum(r * r for r in rb)
        sxy = sum(p * q for p, q in zip(ra, rb))
        num = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        exp_rho = round(num / math.sqrt(vx * vy), 6) if vx > 0 and vy > 0 else None
        assert got[g][0] == n
        assert got[g][1] == exp_rho, g


def _kendall_ref(pairs):
    n = len(pairs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            (a1, b1), (a2, b2) = pairs[i], pairs[j]
            if a1 == a2 or b1 == b2:
                continue
            if (a1 < a2) == (b1 < b2):
                conc += 1
            else:
                disc += 1
    from collections import Counter

    ta = sum(c * (c - 1) / 2 for c in Counter(a for a, _ in pairs).values())
    tb = sum(c * (c - 1) / 2 for c in Counter(b for _, b in pairs).values())
    n0 = n * (n - 1) / 2.0
    denom = math.sqrt((n0 - ta) * (n0 - tb))
    tau = round((conc - disc) / denom, 6) if denom > 0 else None
    return n, conc, disc, tau


def test_kendall_cells_restructure_matches_reference(spark):
    from stackstac_spark.operators.drift import kendall_tau_b

    data = {
        "g1": [(1, 2), (1, 2), (2, 1), (3, 3), (3, 4), (2, 2)],
        "g2": [(5, 1), (5, 2), (5, 3)],  # constant a -> tau NULL, C=D=0
    }
    rows = [(g, float(a), float(b)) for g, ps in data.items() for a, b in ps]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    got = {
        r["g"]: (r["n"], r["concordant"], r["discordant"], r["tau_b"])
        for r in kendall_tau_b(df, "a", "b", ["g"]).collect()
    }
    for g, ps in data.items():
        assert got[g] == _kendall_ref(ps), g


def test_somers_d_cells_restructure_matches_reference(spark):
    from stackstac_spark.operators.nonparam import somers_d

    ps = [(0, 1.0), (0, 3.0), (0, 2.0), (1, 4.0), (1, 2.0), (1, 5.0), (0, 2.0)]
    df = spark.createDataFrame(
        [(float(x), y) for x, y in ps], "x double, y double"
    )
    got = somers_d(df, "x", "y").collect()[0]
    n = len(ps)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = ps[i], ps[j]
            if x1 == x2:
                continue
            if (x1 < x2) == (y1 < y2) and y1 != y2:
                conc += 1
            elif y1 != y2:
                disc += 1
    from collections import Counter

    tx = sum(c * (c - 1) / 2 for c in Counter(x for x, _ in ps).values())
    n0 = n * (n - 1) / 2.0
    exp = round((conc - disc) / (n0 - tx), 6)
    assert (got["n"], got["concordant"], got["discordant"], got["d_yx"]) == (
        n, conc, disc, exp,
    )


def test_star_cc_combined_convergence_check(spark):
    """The one-job violations test must converge to the same components as
    before on the adversarial chain+cross fixture (the cc_star gate shape)
    and on a graph whose intermediate state has a node attached to two
    pure roots (the case the old depth2-only check would have missed —
    both checks are now one aggregate)."""
    from pyspark.sql import functions as F

    from stackstac_spark.operators.graph import connected_components_star

    nums = spark.range(100)
    chain = nums.filter(F.col("id") % 25 != 24).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    cross = nums.filter(F.col("id") % 50 == 3).select(
        F.col("id").alias("id_a"), (F.col("id") + 100).alias("id_b")
    )
    # driver_threshold=0 forces the distributed star rounds — this test
    # pins the one-job convergence check, not the driver union-find path
    comp = {
        r["node"]: r["component"]
        for r in connected_components_star(
            chain.union(cross), driver_threshold=0
        ).collect()
    }
    # chains 0-24 / 25-49 merged via (3,103)? no: +100 edges link node 3->103
    # which is outside 0..99 only when id+100 > 99; recompute reference via
    # union-find
    edges = [(i, i + 1) for i in range(100) if i % 25 != 24] + [
        (i, i + 100) for i in range(100) if i % 50 == 3
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    assert comp == expected


def test_kcore_restructure(spark):
    from pyspark.sql import functions as F

    from stackstac_spark.operators.graph import kcore

    # triangle + tail: kcore(2) keeps the triangle only
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["core_deg"] for r in kcore(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # k larger than any core -> empty
    assert kcore(df, k=3).count() == 0


def test_kcore_driver_matches_distributed(spark):
    """The driver-side cascade peel (default route below driver_threshold)
    must emit row-for-row what the distributed peel rounds emit —
    driver_threshold=0 pins the distributed path."""
    import random

    from stackstac_spark.operators.graph import kcore

    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    # K4 clique so a 3-core exists, plus a cascading chain off node 0
    edges += [(a, b) for a in range(90, 94) for b in range(a + 1, 94)]
    edges += [(0, 50), (50, 51), (51, 52)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    for k in (2, 3):
        fast = {(r["node"], r["core_deg"]) for r in kcore(df, k=k).collect()}
        slow = {
            (r["node"], r["core_deg"])
            for r in kcore(df, k=k, driver_threshold=0).collect()
        }
        assert fast == slow


def test_cooccurrence_recs_shared_incidence(spark):
    """The shared-pruned-incidence restructure must keep the cosine over
    the pruned incidence (hub basket dropped from BOTH numerator and
    denominator)."""
    from stackstac_spark.operators.graph import cooccurrence_recs

    rows = (
        [(100, i) for i in range(1, 6)]  # hub basket (dropped at cap 4)
        + [(200, 1), (200, 2), (201, 1), (201, 2), (202, 2), (202, 3)]
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["item"], r["rec_item"]): (r["weight"], r["score"], r["rank"])
        for r in cooccurrence_recs(
            df, basket_col="basket", item_col="item", k=2, max_basket_size=4
        ).collect()
    }
    # pruned incidence: baskets 200{1,2} 201{1,2} 202{2,3}
    # freqs: 1->2, 2->3, 3->1; pairs: (1,2,w=2), (2,3,w=1)
    s12 = round(2 / math.sqrt(2 * 3), 6)
    s23 = round(1 / math.sqrt(3 * 1), 6)
    assert got[(1, 2)] == (2, s12, 1)
    assert got[(2, 1)] == (2, s12, 1)
    assert got[(3, 2)] == (1, s23, 1)
    assert got[(2, 3)] == (1, s23, 2)


def test_rank_test_cell_algebra_matches_row_level(spark):
    """kruskal_wallis / wilcoxon_signed_rank / cliffs_delta / dunn_posthoc
    collapsed their row-level rank join-back into cell-count-weighted sums
    over a per-(key, value) aggregate (second pass). All the sums' terms
    are exact dyadic rationals, so the statistics must be BIT-identical to
    pure-Python row-level references on a tie-heavy fixture."""
    import random

    from stackstac_spark.operators.nonparam import (
        cliffs_delta,
        dunn_posthoc,
        kruskal_wallis,
        wilcoxon_signed_rank,
    )

    rng = random.Random(11)
    vals = [round(rng.gauss(0, 1), 1) for _ in range(300)]  # heavy ties
    treat = [rng.choice("abc") for _ in range(300)]
    df = spark.createDataFrame(
        list(zip(treat, vals)), "event_type string, x double"
    )

    # kruskal: tie-corrected H from row-level ranks
    rk = _avg_ranks(vals)
    n = len(vals)
    ssr = 0.0
    for t in "abc":
        idx = [i for i in range(n) if treat[i] == t]
        rsum = sum(rk[i] for i in idx)
        ssr += rsum * rsum / len(idx)
    h = 12.0 / (n * (n + 1)) * ssr - 3 * (n + 1)
    tie = 0
    for v in set(vals):
        t_sz = vals.count(v)
        tie += t_sz**3 - t_sz
    h_ref = round(h / (1 - tie / (n**3 - n)), 6)
    got = kruskal_wallis(df, "x", "event_type").collect()[0]
    assert got["h_stat"] == h_ref

    # dunn: mean ranks per treatment, z per pair
    rows = {(r["treat_a"], r["treat_b"]): r for r in dunn_posthoc(df, "x", "event_type").collect()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ta, tb), r in rows.items():
        ia = [i for i in range(n) if treat[i] == ta]
        ib = [i for i in range(n) if treat[i] == tb]
        ra = sum(rk[i] for i in ia) / len(ia)
        rb = sum(rk[i] for i in ib) / len(ib)
        assert r["mean_rank_a"] == round(ra, 6)
        assert r["mean_rank_b"] == round(rb, 6)
        var = (n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))) * (
            1.0 / len(ia) + 1.0 / len(ib)
        )
        assert r["z"] == round((ra - rb) / math.sqrt(var), 6)

    # wilcoxon: signed rank sums over nonzero |d| with ties
    a = [round(rng.gauss(0, 1), 1) for _ in range(200)]
    b = [round(x + rng.gauss(0.1, 0.5), 1) for x in a]
    d = [x - y for x, y in zip(a, b) if x != y]
    ark = _avg_ranks([abs(x) for x in d])
    wp = round(sum(r for r, x in zip(ark, d) if x > 0), 6)
    wm = round(sum(r for r, x in zip(ark, d) if x < 0), 6)
    dfp = spark.createDataFrame(list(zip(a, b)), "pre double, post double")
    got = wilcoxon_signed_rank(dfp, "pre", "post").collect()[0]
    assert got["n"] == len(d)
    assert got["w_plus"] == wp and got["w_minus"] == wm

    # cliffs: brute-force pair comparison
    side = ["click" if i % 3 else "view" for i in range(120)]
    xs = [round(rng.gauss(1.0 if s == "click" else 0.0, 1), 1) for s in side]
    xa = [x for s, x in zip(side, xs) if s == "click"]
    xb = [x for s, x in zip(side, xs) if s == "view"]
    gt = sum(1 for p in xa for q in xb if p > q)
    lt = sum(1 for p in xa for q in xb if p < q)
    delta_ref = round((gt - lt) / (len(xa) * len(xb)), 6)
    dfc = spark.createDataFrame(list(zip(side, xs)), "side string, x double")
    got = cliffs_delta(dfc, "x", "side", "click", "view").collect()[0]
    assert (got["n_a"], got["n_b"]) == (len(xa), len(xb))
    assert got["delta"] == delta_ref

    # degenerate: every pair ties -> n = 0 (not NULL), z NULL
    dfe = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)], "pre double, post double")
    got = wilcoxon_signed_rank(dfe, "pre", "post").collect()[0]
    assert got["n"] == 0 and got["z"] is None


def test_dense_sims_arrow_route_matches_jvm_fold(spark):
    """The collected-side mapInArrow cosine kernel (similarity._dense_sims)
    must be BIT-identical to the crossJoin + aggregate/zip_with fold it
    replaces — same per-dimension operation order, same null propagation,
    same ANSI zero-divisor failure. dense_collect_threshold=0 forces the
    original JVM path; the two runs must agree row for row (unrounded sims
    included, so any fold-order drift fails loudly)."""
    from pyspark.sql import functions as F

    from stackstac_spark.operators.similarity import (
        bitext_margin_pairs,
        cosine_topk,
        knn_classify,
    )

    base = spark.range(120).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 5).alias("label"),
        F.expr(
            "transform(sequence(0, 11), k -> "
            "CAST(sin(CAST(id * 12 + k AS DOUBLE)) AS FLOAT))"
        ).alias("embedding"),
    )
    # adversarial small-side rows: null vector, ragged length, null element
    edge = spark.sql(
        """
        SELECT vec_id, label,
               CASE kind
                 WHEN 0 THEN CAST(NULL AS ARRAY<FLOAT>)
                 WHEN 1 THEN CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)
                 ELSE transform(sequence(0, 11),
                                k -> CAST(IF(k = 3, NULL, 0.5) AS FLOAT))
               END AS embedding
        FROM VALUES (1000L, 0L, 0), (1001L, 1L, 1), (1002L, 2L, 2)
          AS t(vec_id, label, kind)
        """
    )
    corpus = base.unionAll(edge).localCheckpoint()
    queries = base.filter(F.col("vec_id") % 10 == 0).localCheckpoint()

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # cosine_topk: unrounded sims cross the comparison -> bit-exactness
    assert rows(cosine_topk(corpus, queries, k=5)) == rows(
        cosine_topk(corpus, queries, k=5, dense_collect_threshold=0)
    )
    # non-dense SMALL side -> silent fallback to the JVM path, same rows
    oddq = corpus.filter(F.col("vec_id") >= 995)
    assert rows(cosine_topk(base, oddq, k=3)) == rows(
        cosine_topk(base, oddq, k=3, dense_collect_threshold=0)
    )
    # bitext margin rule end to end (rounded sims, window sums, mutual argmax)
    src = base.filter(F.col("label") % 2 == 0)
    tgt = base.filter(F.col("label") % 2 == 1)
    assert rows(bitext_margin_pairs(src, tgt, knn=3, threshold=1.0)) == rows(
        bitext_margin_pairs(src, tgt, knn=3, threshold=1.0, dense_collect_threshold=0)
    )
    # empty small side -> fallback, empty output on both paths
    empty = tgt.filter("vec_id < 0")
    assert (
        bitext_margin_pairs(src, empty, knn=3, threshold=1.0).count()
        == bitext_margin_pairs(
            src, empty, knn=3, threshold=1.0, dense_collect_threshold=0
        ).count()
        == 0
    )
    # knn_classify carries pass-through columns through the kernel
    assert rows(knn_classify(corpus, queries, k=5)) == rows(
        knn_classify(corpus, queries, k=5, dense_collect_threshold=0)
    )
    # ANSI parity: a zero-norm vector fails BOTH paths (JVM raises
    # DIVIDE_BY_ZERO; the kernel raises its mirrored ArithmeticError)
    zero = spark.sql(
        "SELECT 1003L AS vec_id, 3L AS label, "
        "transform(sequence(0, 11), k -> CAST(0.0 AS FLOAT)) AS embedding"
    )
    c2 = base.unionAll(zero)
    for thr in (100_000, 0):
        with pytest.raises(Exception):
            cosine_topk(c2, queries, k=3, dense_collect_threshold=thr).collect()
