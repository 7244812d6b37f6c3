"""r12 new-gate + raster-IO sf1 probe (VERDICT r11 #6 and the r11 new-gate
probe protocol): one COLD pass of each listed gate at sf1
(.localdata/sf1, 10x sf0.1), wall-clock + row count + the machine probe,
one JSON line per gate. Run on an IDLE box (the bench timing discipline).

Usage: env PYTHONPATH=/root/repo python scripts/sf1_probe_r12.py [gates...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R12_GATES = [
    "kruskal_wallis", "friedman_langs", "wilcoxon_paired", "cliffs_delta",
    "somers_gini", "wasserstein_drift", "theilsen_trend", "durbin_watson",
    "runs_test", "brier_decomp", "kripp_alpha", "herfindahl_mix",
    "ccc_rescore", "cronbach_items", "gwet_agreement", "grubbs_outlier",
    "hellinger_langmix", "rate_effect",
    # VERDICT r11 #6: the three raster write/read gates' sf1 IO-path story
    "raster_real_tiff", "raster_tiff_sink", "raster_sql_ndvi",
    # r12-fixed gates whose sf1 shape changed by design
    "good_turing", "rbo_eval",
]


def machine_probe() -> dict:
    import numpy as np

    t0 = time.time()
    a = np.random.default_rng(0).random((1500, 1500))
    (a @ a).sum()
    mat = time.time() - t0
    t0 = time.time()
    s = 0
    for i in range(3_000_000):
        s += i & 7
    return {"matmul_s": round(mat, 3), "pyloop_s": round(time.time() - t0, 3)}


def main() -> int:
    import __spark_entry__ as e
    from stackstac_spark.session import get_spark

    sf1 = os.path.join(REPO, ".localdata", "sf1")
    if not os.path.isdir(sf1):
        print("missing .localdata/sf1 — run scripts/make_sf1.py first")
        return 1
    gates = sys.argv[1:] or R12_GATES
    spark = get_spark("sf1probe", master="local[32]", shuffle_partitions=64)
    print(json.dumps({"probe": machine_probe()}))
    qs = e.queries()
    for name in gates:
        t0 = time.time()
        try:
            n = qs[name](spark, sf1).count()
            print(json.dumps({"gate": name, "rows": n,
                              "wall_s": round(time.time() - t0, 2)}))
        except Exception as ex:
            print(json.dumps({"gate": name, "error": f"{type(ex).__name__}: {ex}"[:200],
                              "wall_s": round(time.time() - t0, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
