"""Paired solver-quality comparison on IDENTICAL problem states.

For each seed, generate the state with the REFERENCE env, then run both
(binary search + MMW + rounding) pipelines on that same state.  The paired
min-feasible-Z difference isolates relaxation/rounding quality from scenario
ensembles (unlike tools/parity_report.py, which compares ensembles).
"""

import argparse
import io
import contextlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--cell", type=int, default=10)
    ap.add_argument("--nit", type=int, default=150)
    ap.add_argument("--eta", type=float, default=0.04)
    args = ap.parse_args()

    from make_golden_fixtures import _install_stubs

    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from sim_src.env.env import env as RefEnv
    from sim_src.alg.mmw import mmw as RefMMW
    from sim_src.alg.binary_search_relaxation import binary_search_relaxation

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sig_sdp_mmw_tpu.core.problem import state_from_scipy
    from sig_sdp_mmw_tpu.models import MMW, BinarySearchRelaxation

    print(f"cell={args.cell} nit={args.nit} eta={args.eta}", flush=True)
    rows = []
    for seed in range(args.seeds):
        e = RefEnv(cell_size=args.cell, sta_density_per_1m2=75e-4, seed=seed)
        state_ref = e.generate_S_Q_hmax()

        np.random.seed(seed)
        bs = binary_search_relaxation()
        alg = RefMMW(nit=args.nit, eta=args.eta)
        bs.feasibility_check_alg = alg
        with contextlib.redirect_stdout(io.StringIO()):
            _, Z_ref, rem_ref = bs.run(state_ref)

        st = state_from_scipy(state_ref)
        bs2 = BinarySearchRelaxation()
        alg2 = MMW(nit=args.nit, eta=args.eta, seed=seed)
        bs2.feasibility_check_alg = alg2
        with contextlib.redirect_stdout(io.StringIO()):
            _, Z_ours, rem_ours = bs2.run(st)

        rows.append((seed, Z_ref, rem_ref, Z_ours, rem_ours))
        print(f"seed={seed}: ref Z={Z_ref} (rem {rem_ref})  "
              f"ours Z={Z_ours} (rem {rem_ours})", flush=True)

    arr = np.asarray(rows, dtype=float)
    d = arr[:, 3] - arr[:, 1]
    print(f"\npaired Z diff (ours - ref): mean {d.mean():+.2f}  "
          f"median {np.median(d):+.1f}  win/tie/loss "
          f"{(d < 0).sum()}/{(d == 0).sum()}/{(d > 0).sum()}", flush=True)


if __name__ == "__main__":
    main()
