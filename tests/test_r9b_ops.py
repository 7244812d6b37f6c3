"""r9 second-wave operators vs brute-force references: grid DBSCAN,
clustering coefficient, neighborhood Jaccard, terrain TRI/TPI/roughness,
supervised Fellegi-Sunter, Poisson bootstrap, split conformal, tokenizer
fertility, boolean retrieval."""

import hashlib
import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from stackstac_spark.operators.composite import terrain_ruggedness
from stackstac_spark.operators.graph import clustering_coefficient, neighbor_jaccard
from stackstac_spark.operators.linkage import (
    fellegi_sunter_score,
    fellegi_sunter_train,
)
from stackstac_spark.operators.mlfit import conformal_interval
from stackstac_spark.operators.sampling import POISSON1_CDF_HEX, poisson_bootstrap_ci
from stackstac_spark.operators.spatial import grid_cluster
from stackstac_spark.operators.textstats import boolean_retrieval, token_fertility


def _brute_dbscan(pts, eps, min_pts):
    nbr = {i: set() for i, _, _ in pts}
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2):
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps:
            nbr[i].add(j)
            nbr[j].add(i)
    core = {i for i in nbr if len(nbr[i]) + 1 >= min_pts}
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nbr[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp_min = {}
    for i in core:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    lbl = {i: comp_min[find(i)] for i in core}
    for i in nbr:
        if i not in core:
            cands = [lbl[j] for j in nbr[i] if j in core]
            lbl[i] = min(cands) if cands else None
    return {i: (lbl.get(i), i in core) for i, _, _ in pts}


@pytest.mark.parametrize("eps,min_pts", [(0.5, 1), (0.5, 4), (1.0, 3)])
def test_grid_cluster_matches_brute_force(spark, eps, min_pts):
    random.seed(7)
    pts = [(i, random.uniform(0, 10), random.uniform(0, 10)) for i in range(250)]
    df = spark.createDataFrame(pts, "point_id BIGINT, x DOUBLE, y DOUBLE")
    got = {
        r["point_id"]: (r["cluster"], r["is_core"])
        for r in grid_cluster(df, eps, min_pts=min_pts).collect()
    }
    assert got == _brute_dbscan(pts, eps, min_pts)


def test_grid_cluster_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "point_id BIGINT, x DOUBLE, y DOUBLE")
    with pytest.raises(ValueError, match="eps"):
        grid_cluster(df, 0.0)
    with pytest.raises(ValueError, match="min_pts"):
        grid_cluster(df, 1.0, min_pts=0)
    with pytest.raises(ValueError, match="eps-cell"):
        big = spark.range(30).select(
            F.col("id").alias("point_id"),
            F.lit(0.5).alias("x"),
            F.lit(0.5).alias("y"),
        )
        grid_cluster(big, 1.0, max_cell_count=10)


def _random_graph(seed, n=50, m=160):
    random.seed(seed)
    edges = set()
    while len(edges) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def test_clustering_coefficient_matches_brute_force(spark):
    edges, adj = _random_graph(11)
    edf = spark.createDataFrame(sorted(edges), "id_a BIGINT, id_b BIGINT")
    got = {
        r["node"]: (r["deg"], r["n_tri"], r["cc"])
        for r in clustering_coefficient(edf).collect()
    }
    for v, ns in adj.items():
        if len(ns) < 2:
            assert v not in got
            continue
        t = sum(
            1
            for u, w in itertools.combinations(ns, 2)
            if (min(u, w), max(u, w)) in edges
        )
        assert got[v] == (len(ns), t, round(2 * t / (len(ns) * (len(ns) - 1)), 6))


def test_neighbor_jaccard_matches_brute_force(spark):
    edges, adj = _random_graph(13)
    edf = spark.createDataFrame(sorted(edges), "id_a BIGINT, id_b BIGINT")
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in neighbor_jaccard(edf).collect()
    }
    exp = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if (u, v) in edges:
            continue
        c = len(adj[u] & adj[v])
        if c:
            exp[(u, v)] = (c, round(c / len(adj[u] | adj[v]), 6))
    assert got == exp


def test_terrain_ruggedness_matches_brute_force(spark):
    random.seed(3)
    H, W = 10, 11
    vals = {(r, c): round(random.uniform(0, 100), 3) for r in range(H) for c in range(W)}
    df = spark.createDataFrame(
        [(0, 0, r, c, v) for (r, c), v in vals.items()],
        "item_idx INT, band_idx INT, row INT, col INT, value DOUBLE",
    )
    got = {
        (r["row"], r["col"]): (r["tri"], r["tpi"], r["roughness"])
        for r in terrain_ruggedness(df).collect()
    }
    assert len(got) == (H - 2) * (W - 2)  # full stencils only
    for r in range(1, H - 1):
        for c in range(1, W - 1):
            ctr = vals[(r, c)]
            ns = [
                vals[(r + dy, c + dx)]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if not (dy == 0 and dx == 0)
            ]
            tri = math.sqrt(sum((ctr - n) ** 2 for n in ns))
            tpi = ctr - sum(ns) / 8
            rough = max(ns + [ctr]) - min(ns + [ctr])
            g = got[(r, c)]
            assert abs(g[0] - tri) < 1e-5
            assert abs(g[1] - tpi) < 1e-5
            assert abs(g[2] - rough) < 1e-9


def test_terrain_ruggedness_nan_breaks_stencil(spark):
    rows = [
        (0, 0, r, c, float("nan") if (r, c) == (1, 1) else 1.0 * r + c)
        for r in range(5)
        for c in range(5)
    ]
    df = spark.createDataFrame(
        rows, "item_idx INT, band_idx INT, row INT, col INT, value DOUBLE"
    )
    got = {(r["row"], r["col"]) for r in terrain_ruggedness(df).collect()}
    # every interior cell within the NaN's 3x3 halo (and the NaN itself) drops
    assert got == {(1, 3), (2, 3), (3, 1), (3, 2), (3, 3)}


def test_fellegi_sunter_train_and_score(spark):
    rows = [
        (1, 2, True, True, True),
        (1, 3, True, False, True),
        (2, 3, False, True, False),
        (4, 5, True, True, True),
        (4, 6, False, False, False),
        (5, 6, True, False, False),
        (7, 8, False, True, True),
        (7, 9, True, True, False),
    ]
    df = spark.createDataFrame(
        rows, "id_a INT, id_b INT, agree_name BOOLEAN, agree_city BOOLEAN, is_match BOOLEAN"
    )
    w = fellegi_sunter_train(df, ["agree_name", "agree_city"])
    wrows = {r["field"]: r for r in w.collect()}
    lap = 0.5
    for f, idx in [("agree_name", 2), ("agree_city", 3)]:
        m = (sum(1 for r in rows if r[4] and r[idx]) + lap) / (
            sum(1 for r in rows if r[4]) + 1
        )
        u = (sum(1 for r in rows if not r[4] and r[idx]) + lap) / (
            sum(1 for r in rows if not r[4]) + 1
        )
        assert wrows[f]["m"] == round(m, 6)
        assert wrows[f]["u"] == round(u, 6)
        assert wrows[f]["w_agree"] == round(math.log2(m / u), 6)
        assert wrows[f]["w_disagree"] == round(math.log2((1 - m) / (1 - u)), 6)
    scored = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in fellegi_sunter_score(df, w, ["agree_name", "agree_city"]).collect()
    }
    for row in rows:
        exp = round(
            (wrows["agree_name"]["w_agree"] if row[2] else wrows["agree_name"]["w_disagree"])
            + (wrows["agree_city"]["w_agree"] if row[3] else wrows["agree_city"]["w_disagree"]),
            4,
        )
        assert scored[(row[0], row[1])] == exp


def test_fellegi_sunter_validation(spark):
    df = spark.createDataFrame([(1, 2, True, True)], "id_a INT, id_b INT, a BOOLEAN, is_match BOOLEAN")
    with pytest.raises(ValueError, match="non-empty"):
        fellegi_sunter_train(df, [])
    with pytest.raises(ValueError, match="laplace"):
        fellegi_sunter_train(df, ["a"], laplace=0.0)


def test_poisson_bootstrap_ci_matches_reference(spark):
    rows = [(i, float(i % 13) + 0.5) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, v DOUBLE")
    got = poisson_bootstrap_ci(df, "v", n_boot=50).collect()[0]
    means = []
    for b in range(1, 51):
        num = den = 0
        for i, v in rows:
            h = hashlib.md5(f"boot:{b}:{i}".encode()).hexdigest()[:8]
            w = sum(1 for t in POISSON1_CDF_HEX if h >= t)
            num += w * v
            den += w
        means.append(num / den)
    means.sort()
    k_lo = int(0.025 * 50) + 1
    assert got["mean"] == round(sum(v for _, v in rows) / len(rows), 6)
    assert got["ci_lo"] == round(means[k_lo - 1], 6)
    assert got["ci_hi"] == round(means[50 - k_lo], 6)
    assert got["ci_lo"] <= got["mean"] <= got["ci_hi"]


def test_poisson_bootstrap_grouped(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i)) for i in range(100)],
        "doc_id BIGINT, g STRING, v DOUBLE",
    )
    out = poisson_bootstrap_ci(df, "v", keys=["g"], n_boot=20).collect()
    assert {r["g"] for r in out} == {"g0", "g1"}
    for r in out:
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]


def test_conformal_interval_exact_order_stat(spark):
    random.seed(5)
    cal = [(float(i), float(i) + random.uniform(-2, 2)) for i in range(100)]
    caldf = spark.createDataFrame(cal, "y DOUBLE, yhat DOUBLE")
    test = spark.createDataFrame([(float(i) + 0.3,) for i in range(10)], "yhat DOUBLE")
    out = conformal_interval(caldf, test, alpha=0.1).collect()
    res = sorted(abs(y - yh) for y, yh in cal)
    q = round(res[math.ceil(101 * 0.9) - 1], 6)
    assert len(out) == 10
    for r in out:
        assert r["qhat"] == q
        assert abs((r["pi_hi"] - r["yhat"]) - q) < 1e-9
        assert abs((r["yhat"] - r["pi_lo"]) - q) < 1e-9


def test_conformal_validation(spark):
    caldf = spark.createDataFrame([(1.0, 1.0)], "y DOUBLE, yhat DOUBLE")
    test = spark.createDataFrame([(1.0,)], "yhat DOUBLE")
    with pytest.raises(ValueError, match="alpha"):
        conformal_interval(caldf, test, alpha=1.5)
    with pytest.raises(ValueError, match="calibration rows"):
        conformal_interval(caldf, test, alpha=0.1)  # rank 2 > n_cal 1


def test_token_fertility(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "hello world, the cat!"),
            (2, "a", "cat cat dog"),
            (3, "b", "the quick brown fox"),
        ],
        "doc_id BIGINT, source STRING, text STRING",
    )
    rows = {r["source"]: r for r in token_fertility(docs).collect()}
    # source a: 7 words, 9 bpe tokens ("hello world , the cat !" + "cat cat dog"),
    # 33 chars, 7 distinct types
    assert rows["a"]["n_words"] == 7
    assert rows["a"]["n_tokens"] == 9
    assert rows["a"]["fertility"] == round(9 / 7, 6)
    assert rows["b"]["fertility"] == 1.0


def test_boolean_retrieval_modes(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world, the cat!"),
            (2, "cat cat dog"),
            (3, "the quick brown fox"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got_and = boolean_retrieval(docs, ["cat", "dog"], mode="and").collect()
    assert [(r["doc_id"], r["total_tf"]) for r in got_and] == [(2, 3)]
    got_or = {r["doc_id"]: r["total_tf"] for r in boolean_retrieval(docs, ["cat", "fox"], mode="or").collect()}
    assert got_or == {1: 1, 2: 2, 3: 1}
    with pytest.raises(ValueError, match="mode"):
        boolean_retrieval(docs, ["cat"], mode="xor")
    with pytest.raises(ValueError, match="non-empty"):
        boolean_retrieval(docs, [])


def test_seasonal_decompose_matches_manual(spark):
    vals = [10 + 3 * math.sin(2 * math.pi * t / 4) + 0.1 * t for t in range(20)]
    sdf = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(vals)], "k STRING, t INT, value DOUBLE"
    )
    from stackstac_spark.operators.timeseries import seasonal_decompose

    out = {
        r["t"]: (r["trend"], r["seasonal"], r["resid"])
        for r in seasonal_decompose(sdf, 4, keys=["k"]).collect()
    }
    p, h = 4, 2
    trend = {}
    for t in range(h, 20 - h):
        w = vals[t - h : t + h + 1]
        trend[t] = (sum(w) - 0.5 * w[0] - 0.5 * w[-1]) / p
    det = {t: vals[t] - trend[t] for t in trend}
    ph = {}
    for t, d in det.items():
        ph.setdefault(t % p, []).append(d)
    sraw = {k: sum(v) / len(v) for k, v in ph.items()}
    smean = sum(sraw.values()) / len(sraw)
    for t in range(20):
        g = out[t]
        assert g[1] == round(sraw[t % p] - smean, 6)
        if t in trend:
            assert abs(g[0] - trend[t]) < 1e-6
            assert abs(g[2] - (vals[t] - trend[t] - (sraw[t % p] - smean))) < 1e-6
        else:
            assert g[0] is None and g[2] is None
    # seasonal component ~0 over one period
    assert abs(sum(out[t][1] for t in range(4))) < 1e-4
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(sdf, 1, keys=["k"])


def test_modularity_matches_brute(spark):
    from collections import Counter

    from stackstac_spark.operators.graph import modularity

    edges, adj = _random_graph(4, n=40, m=120)
    comm = {n: n % 5 for n in range(40)}
    edf = spark.createDataFrame(sorted(edges), "id_a BIGINT, id_b BIGINT")
    cdf = spark.createDataFrame(sorted(comm.items()), "node BIGINT, community BIGINT")
    got = {
        r["community"]: (r["n_nodes"], r["e_in"], r["d_tot"], r["q_c"])
        for r in modularity(edf, cdf).collect()
    }
    m = len(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for c in set(comm.values()):
        nodes = [n for n in comm if comm[n] == c and deg[n] > 0]
        e_in = sum(1 for a, b in edges if comm[a] == c and comm[b] == c)
        d = sum(deg[n] for n in nodes)
        assert got[c] == (len(nodes), e_in, d, round(e_in / m - (d / (2 * m)) ** 2, 6))
    # perfect partition (each component its own community) has max Q for
    # this edge set: compare against the 1-community degenerate case Q=0
    one = spark.createDataFrame([(n, 0) for n in range(40)], "node BIGINT, community BIGINT")
    total_one = sum(r["q_c"] for r in modularity(edf, one).collect())
    assert abs(total_one) < 1e-9


def test_fleiss_kappa_known_values(spark):
    from stackstac_spark.operators.evalmetrics import fleiss_kappa

    # perfect agreement -> kappa 1
    rows = [(i, c) for i in range(10) for c in ["x" if i % 2 else "y"] * 3]
    df = spark.createDataFrame(rows, "item_id INT, category STRING")
    got = fleiss_kappa(df).collect()[0]
    assert got["kappa"] == 1.0 and got["n_raters"] == 3
    # unequal rater counts rejected
    bad = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x")], "item_id INT, category STRING"
    )
    with pytest.raises(ValueError, match="constant rater count"):
        fleiss_kappa(bad)


def test_cooccurrence_recs_matches_brute(spark):
    from collections import Counter

    from stackstac_spark.operators.graph import cooccurrence_recs

    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["b", "c", "d"],
        4: ["a", "d"],
        5: ["a", "b"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket BIGINT, item STRING")
    got = {
        (r["item"], r["rank"]): (r["rec_item"], r["weight"], r["score"])
        for r in cooccurrence_recs(df, "basket", "item", k=2).collect()
    }
    freq = Counter(i for items in baskets.values() for i in set(items))
    co = Counter()
    for items in baskets.values():
        s = sorted(set(items))
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                co[(s[x], s[y])] += 1
    import math

    recs = {}
    for (a, b), w in co.items():
        for item, rec in ((a, b), (b, a)):
            recs.setdefault(item, []).append(
                (round(w / math.sqrt(freq[item] * freq[rec]), 6), w, rec)
            )
    for item, lst in recs.items():
        lst.sort(key=lambda t: (-t[0], -t[1], t[2]))
        for rank, (score, w, rec) in enumerate(lst[:2], 1):
            assert got[(item, rank)] == (rec, w, score), (item, rank)


def test_target_encode_out_of_fold(spark):
    from stackstac_spark.operators.mlfit import target_encode

    rows = [(i, "c%d" % (i % 3), float(i), i % 2) for i in range(30)]
    df = spark.createDataFrame(rows, "id BIGINT, cat STRING, y DOUBLE, fold INT")
    out = {r["id"]: r["target_enc"] for r in target_encode(df, "cat", "y", "fold", smoothing=5.0).collect()}
    s_all = sum(r[2] for r in rows)
    n_all = len(rows)
    for i, cat, y, fold in rows:
        s_cat = sum(r[2] for r in rows if r[1] == cat)
        n_cat = sum(1 for r in rows if r[1] == cat)
        s_cf = sum(r[2] for r in rows if r[1] == cat and r[3] == fold)
        n_cf = sum(1 for r in rows if r[1] == cat and r[3] == fold)
        s_f = sum(r[2] for r in rows if r[3] == fold)
        n_f = sum(1 for r in rows if r[3] == fold)
        prior = (s_all - s_f) / (n_all - n_f)
        exp = round((s_cat - s_cf + 5.0 * prior) / (n_cat - n_cf + 5.0), 6)
        assert out[i] == exp, (i, out[i], exp)
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, "cat", "y", "fold", smoothing=0.0)


def test_negative_samples_deterministic_and_clean(spark):
    from stackstac_spark.operators.sampling import negative_samples

    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)], "user_id BIGINT, item_id BIGINT"
    )
    out1 = sorted(
        (r["user_id"], r["pos_item"], r["j"], r["neg_item"])
        for r in negative_samples(pos, n_items=50, k=3).collect()
    )
    out2 = sorted(
        (r["user_id"], r["pos_item"], r["j"], r["neg_item"])
        for r in negative_samples(pos, n_items=50, k=3).collect()
    )
    assert out1 == out2  # pure function of (salt, user, item, j)
    positives = {(1, 10), (1, 11), (2, 10), (2, 12)}
    for u, p, j, n in out1:
        assert (u, n) not in positives
        assert 1 <= n <= 50
    # md5 replay
    import hashlib

    for u, p, j, n in out1[:5]:
        h = int(hashlib.md5(f"neg:{u}:{p}:{j}".encode()).hexdigest()[:15], 16)
        assert n == h % 50 + 1
    with pytest.raises(ValueError, match="n_items"):
        negative_samples(pos, n_items=1)


def test_personalized_pagerank_both_strategies(spark):
    from stackstac_spark.operators.graph import personalized_pagerank

    edges, adj = _random_graph(21, n=40, m=150)
    edf = spark.createDataFrame(sorted(edges), "id_a BIGINT, id_b BIGINT")
    seeds = spark.createDataFrame([(n,) for n in (0, 5, 10)], "node BIGINT")
    deg = {v: len(ns) for v, ns in adj.items()}
    nodes = sorted(deg)
    S = {0, 5, 10} & set(nodes)
    base = 0.15 / len(S)
    rank = {v: (1.0 / len(S) if v in S else 0.0) for v in nodes}
    for _ in range(5):
        rank = {
            v: (base if v in S else 0.0)
            + 0.85 * sum(rank[s] / deg[s] for s in adj.get(v, []))
            for v in nodes
        }
    exp = {v: round(rank[v], 6) for v in nodes}
    got_drv = {r["node"]: r["rank"] for r in personalized_pagerank(edf, seeds).collect()}
    got_dist = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edf, seeds, driver_threshold=0).collect()
    }
    assert got_drv == exp
    assert got_dist == exp
    assert abs(sum(got_drv.values()) - 1.0) < 1e-4  # PPR mass conserved
    bad = spark.createDataFrame([(99999,)], "node BIGINT")
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(edf, bad)
