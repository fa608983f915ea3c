"""Measure the reference implementation's MMW performance on this host CPU.

Runs the actual reference code (with stub modules for its missing deps) on a
K=300 journal-scale instance and records per-iteration / whole-solve wall
times into baseline_measurement.json, which bench.py uses for vs_baseline.

Usage: python tools/measure_baseline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_golden_fixtures import _install_stubs  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from sim_src.env.env import env as RefEnv
    from sim_src.alg.mmw import mmw as RefMMW

    # Journal-scale instance: cell_size=10, rho=0.0075 -> K=300
    # (sim_script/journal_version/sim_mmw_time.py uses the same family).
    e = RefEnv(cell_size=10, sta_density_per_1m2=0.0075, seed=7)
    state = e.generate_S_Q_hmax()
    K = state[0].shape[0]
    Z = 12  # the feasible Z found by binary search on this instance

    NIT = 150
    ETA = 0.05
    np.random.seed(0)
    alg = RefMMW(nit=NIT, eta=ETA, log_gap=False)

    t0 = time.time()
    ok, X_half = alg.run_with_state(0, Z, state)
    t1 = time.time()

    per_it = alg.LOGGED_NP_DATA["mmw_per_it"][:, 5]  # payload col: tim (us)
    expm = alg.LOGGED_NP_DATA["mmw_expm"][:, 5]
    dual = alg.LOGGED_NP_DATA["mmw_dual"][:, 5]
    loss = alg.LOGGED_NP_DATA["mmw_loss"][:, 5]

    out = {
        "host": "round-driver CPU",
        "reference": "zhouyou-gu/sig-sdp-mmw sim_src/alg/mmw.py",
        "instance": {"cell_size": 10, "rho": 0.0075, "seed": 7, "K": K, "Z": Z,
                     "nit": NIT, "eta": ETA},
        "solve_wall_s": t1 - t0,
        "iters_per_sec": NIT / (t1 - t0),
        "per_it_us_mean": float(per_it.mean()),
        "expm_us_mean": float(expm.mean()),
        "dual_us_mean": float(dual.mean()),
        "loss_us_mean": float(loss.mean()),
    }
    path = os.path.join(REPO, "baseline_measurement.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
