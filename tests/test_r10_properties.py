"""Property tests for the r10 operators: random inputs vs brute-force
replays (deterministic seeds, no flakiness) — the rigor layer above
test_r10_ops.py's closed-form cases."""

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- isotonic


def _brute_pav(pairs):
    """Reference PAV over (pos, n) bins via the minimax identity
    iso[i] = max_{j<=i} min_{k>=i} avg(y[j..k]) — an INDEPENDENT
    formulation of what the operator computes by pooling."""
    m = len(pairs)
    cpos = [0.0]
    cn = [0]
    for p, n in pairs:
        cpos.append(cpos[-1] + p)
        cn.append(cn[-1] + n)

    def seg(j, k):  # 1-indexed inclusive
        return (cpos[k] - cpos[j - 1]) / (cn[k] - cn[j - 1])

    out = []
    for i in range(1, m + 1):
        out.append(
            max(min(seg(j, k) for k in range(i, m + 1)) for j in range(1, i + 1))
        )
    return out


def test_isotonic_matches_minimax_identity(spark):
    from stackstac_spark.operators.mlfit import isotonic_calibrate

    rng = random.Random(42)
    for trial in range(5):
        n_bins = rng.randint(3, 10)
        rows = []
        per_bin = []
        for b in range(n_bins):
            n = rng.randint(1, 8)
            pos = rng.randint(0, n)
            per_bin.append((float(pos), n))
            rows += [(float(b), 1.0)] * pos + [(float(b), 0.0)] * (n - pos)
        df = spark.createDataFrame(rows, "score double, label double")
        got = sorted(
            (r["bin"], r["rate_iso"])
            for r in isotonic_calibrate(df, "score", "label", bins=n_bins).collect()
        )
        expect = [round(v, 6) for v in _brute_pav(per_bin)]
        assert [v for _, v in got] == expect, (trial, per_bin, got, expect)
        # monotone by construction
        vals = [v for _, v in got]
        assert vals == sorted(vals)


def test_isotonic_mass_preservation(spark):
    """Σ n_b·rate_iso == Σ pos (PAV preserves the total positive mass)."""
    from stackstac_spark.operators.mlfit import isotonic_calibrate

    rng = random.Random(7)
    rows = []
    for b in range(8):
        n = rng.randint(2, 12)
        pos = rng.randint(0, n)
        rows += [(float(b), 1.0)] * pos + [(float(b), 0.0)] * (n - pos)
    df = spark.createDataFrame(rows, "score double, label double")
    out = isotonic_calibrate(df, "score", "label", bins=8).collect()
    total_pos = sum(r["pos"] for r in out)
    mass = sum(r["n"] * r["rate_iso"] for r in out)
    assert abs(mass - total_pos) < 1e-4


# ---------------------------------------------------------------- silhouette


def test_silhouette_matches_brute_force(spark):
    from stackstac_spark.operators.similarity import silhouette_centroid

    rng = random.Random(99)
    for trial in range(3):
        k = rng.randint(2, 4)
        dim = rng.randint(2, 5)
        cents = [[rng.uniform(-5, 5) for _ in range(dim)] for _ in range(k)]
        pts = [
            (i, [rng.uniform(-6, 6) for _ in range(dim)], rng.randrange(k))
            for i in range(rng.randint(5, 15))
        ]
        df = spark.createDataFrame(
            pts, "vec_id long, embedding array<double>, cluster int"
        )
        got = {r["vec_id"]: r for r in silhouette_centroid(df, cents).collect()}
        for i, v, own in pts:
            ds = [
                round(math.sqrt(sum((a - b) ** 2 for a, b in zip(v, c))), 6)
                for c in cents
            ]
            a = ds[own]
            b = min(d for j, d in enumerate(ds) if j != own)
            assert got[i]["a"] == a and got[i]["b"] == b, (trial, i)
            if max(a, b) > 0:
                assert got[i]["s"] == round((b - a) / max(a, b), 6)
            else:
                assert got[i]["s"] == 0.0


# ---------------------------------------------------------------- MI


def test_mutual_information_matches_brute_force(spark):
    from stackstac_spark.operators.drift import mutual_information

    rng = random.Random(5)
    for trial in range(3):
        rows = [
            (rng.choice("abc"), rng.choice("xy"))
            for _ in range(rng.randint(10, 60))
        ]
        df = spark.createDataFrame(rows, "x string, y string")
        r = mutual_information(df, "x", "y").first()
        n = len(rows)
        from collections import Counter

        cxy = Counter(rows)
        cx = Counter(x for x, _ in rows)
        cy = Counter(y for _, y in rows)
        mi = sum(
            (c / n) * math.log(c * n / (cx[x] * cy[y]))
            for (x, y), c in cxy.items()
        )
        hx = -sum((c / n) * math.log(c / n) for c in cx.values())
        hy = -sum((c / n) * math.log(c / n) for c in cy.values())
        assert abs(r["mi"] - mi) < 1e-5, trial
        assert r["mi"] >= -1e-9  # MI is non-negative
        assert r["mi"] <= min(hx, hy) + 1e-6  # bounded by both entropies
        if hx > 0 and hy > 0:
            assert abs(r["nmi"] - mi / math.sqrt(hx * hy)) < 1e-5


# ---------------------------------------------------------------- Hill


def test_hill_estimator_recovers_pareto_alpha(spark):
    """On an exact Pareto(α) quantile sample x_i = (i/n)^(-1/α) the Hill
    estimate converges near α for k ≪ n."""
    from stackstac_spark.operators.textstats import hill_tail_index

    for alpha in (1.0, 2.0):
        n = 4000
        rows = [((i / n) ** (-1.0 / alpha),) for i in range(1, n + 1)]
        df = spark.createDataFrame(rows, "v double")
        got = hill_tail_index(df, "v", k=200).first()["hill_alpha"]
        assert abs(got - alpha) / alpha < 0.15, (alpha, got)


def test_hill_scale_invariance(spark):
    """Hill's α̂ is invariant under multiplicative scaling of the data."""
    from stackstac_spark.operators.textstats import hill_tail_index

    rng = random.Random(11)
    vals = [rng.paretovariate(1.5) for _ in range(500)]
    df1 = spark.createDataFrame([(v,) for v in vals], "v double")
    df2 = spark.createDataFrame([(v * 1000.0,) for v in vals], "v double")
    a1 = hill_tail_index(df1, "v", k=50).first()["hill_alpha"]
    a2 = hill_tail_index(df2, "v", k=50).first()["hill_alpha"]
    assert abs(a1 - a2) < 1e-4


# ---------------------------------------------------------------- SAX


def test_sax_matches_brute_force(spark):
    from stackstac_spark.operators.timeseries import sax_symbols

    rng = random.Random(21)
    for trial in range(3):
        n = rng.randint(8, 40)
        w = rng.randint(2, min(8, n))
        vals = [rng.uniform(-10, 10) for _ in range(n)]
        df = spark.createDataFrame(
            [("k", t, v) for t, v in enumerate(vals)], "k string, t int, v double"
        )
        out = {r["seg"]: r for r in sax_symbols(df, w, "t", "v", ["k"]).collect()}
        mu = sum(vals) / n
        sd = math.sqrt(max(sum(v * v for v in vals) / n - mu * mu, 0.0))
        z = [round((v - mu) / sd, 6) if sd > 0 else 0.0 for v in vals]
        segs = {}
        for idx, zv in enumerate(z):
            segs.setdefault(idx * w // n, []).append(zv)
        bps = [-0.67, 0.0, 0.67]
        for s_idx, zs in segs.items():
            paa = round(sum(zs) / len(zs), 6)
            sym = "abcd"[sum(paa >= b for b in bps)]
            assert out[s_idx]["n_pts"] == len(zs), trial
            assert abs(out[s_idx]["paa"] - paa) < 2e-6, (trial, s_idx)
            assert out[s_idx]["symbol"] == sym, (trial, s_idx, paa)
        # every point lands in exactly one segment; counts sum to n
        assert sum(r["n_pts"] for r in out.values()) == n


# ---------------------------------------------------------------- label noise


def test_label_noise_never_flags_perfectly_separated(spark):
    from stackstac_spark.operators.mlfit import label_noise_flags

    rng = random.Random(3)
    rows = [(i, rng.uniform(0.8, 1.0), 1) for i in range(30)] + [
        (100 + i, rng.uniform(0.0, 0.2), 0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, p double, y int")
    out = label_noise_flags(df, "p", "y").collect()
    # thresholds sit inside each class's band; no clean row can cross
    assert not any(r["flagged"] for r in out)


# ---------------------------------------------------------------- calibration


def test_calibration_error_bounds_and_shift(spark):
    from stackstac_spark.operators.evalmetrics import calibration_error

    rng = random.Random(17)
    rows = [(rng.random(), float(rng.random() < 0.5)) for _ in range(400)]
    df = spark.createDataFrame(rows, "p double, y double")
    r = calibration_error(df, "p", "y", bins=10).first()
    assert 0.0 <= r["ece"] <= r["mce"] <= 1.0
    assert 0.0 <= r["brier"] <= 1.0
    # systematically shifting probabilities away from truth raises ECE
    from pyspark.sql import functions as F

    shifted = df.select(
        F.least(F.lit(1.0), F.col("p") * 0.2 + 0.8).alias("p"), "y"
    )
    r2 = calibration_error(shifted, "p", "y", bins=10).first()
    assert r2["ece"] > r["ece"]
