"""Benchmark: MMW solver iterations/sec on the journal-scale K=300 instance.

The reference's headline claim is MMW wall-clock speed vs the SCS oracle
(sim_mmw_scs_iter_time.py / sim_mmw_time.py); the north-star metric
(BASELINE.json) is MMW iterations/sec at matched convergence settings.

Baseline: the ACTUAL reference implementation (numpy/scipy, single thread)
measured on this host by tools/measure_baseline.py -> baseline_measurement.json
(K=300, Z=12, nit=150, eta=0.05: see that file for the phase breakdown).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "baseline_measurement.json")) as f:
        base = json.load(f)

    from sig_sdp_mmw_tpu.env import WirelessEnv
    from sig_sdp_mmw_tpu.models.mmw import mmw_solve

    cfg = base["instance"]
    NIT, ETA, Z = cfg["nit"], cfg["eta"], cfg["Z"]

    env = WirelessEnv(cell_size=cfg["cell_size"],
                      sta_density_per_1m2=cfg["rho"], seed=cfg["seed"],
                      pad_to=320)
    state = env.generate_S_Q_hmax()

    D_pad = 32  # Z * rank_radio = 24, padded to 32

    @jax.jit
    def solve(state, Z, key):
        return mmw_solve(state, Z, nit=NIT, eta=ETA, D_pad=D_pad,
                         rank_pad=D_pad, key=key)

    key = jax.random.PRNGKey(0)
    out = solve(state, float(Z), key)          # compile + warmup
    jax.block_until_ready(out.X_half)

    times = []
    for i in range(5):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = solve(state, float(Z), k)
        jax.block_until_ready(out.X_half)
        times.append(time.perf_counter() - t0)

    t = float(np.median(times))
    iters_per_sec = NIT / t
    ref = base["iters_per_sec"]

    print(json.dumps({
        "metric": "mmw_iterations_per_sec_K300",
        "value": round(iters_per_sec, 2),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / ref, 2),
    }))


if __name__ == "__main__":
    main()
