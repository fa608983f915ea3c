"""Generate golden parity fixtures by RUNNING the reference implementation.

This executes the untrusted reference code at /root/reference read-only to
record its numerical behavior (env state matrices, evaluator outputs, MMW
trajectories) into small .npz fixtures committed under tests/fixtures/.
No reference code is copied; we only capture inputs/outputs.

The reference imports cvxpy and line_profiler, which are absent in this
image; both are stubbed (the code paths we exercise never call into them).

Usage:  python tools/make_golden_fixtures.py
"""

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def _install_stubs():
    if "cvxpy" not in sys.modules:
        cp = types.ModuleType("cvxpy")

        def _unavailable(*a, **k):
            raise RuntimeError("cvxpy stub: not available in this image")

        cp.Variable = _unavailable
        cp.Problem = _unavailable
        cp.Minimize = _unavailable
        cp.multiply = _unavailable
        cp.diag = _unavailable
        cp.SCS = "SCS"
        sys.modules["cvxpy"] = cp
    if "line_profiler" not in sys.modules:
        lp = types.ModuleType("line_profiler")

        class LineProfiler:
            def __call__(self, f):
                return f

            def print_stats(self, *a, **k):
                pass

        lp.LineProfiler = LineProfiler
        sys.modules["line_profiler"] = lp


def main():
    _install_stubs()
    sys.path.insert(0, REF)
    os.makedirs(OUT, exist_ok=True)

    from sim_src.env.env import env as RefEnv
    from sim_src.alg.mmw import mmw as RefMMW
    from sim_src.alg.binary_search_relaxation import binary_search_relaxation as RefBS

    # ---------------- env fixture: small + medium scenarios -----------------
    for name, cell_size, density, seed in [
        ("env_small", 5, 0.0075, 1),
        ("env_mid", 10, 0.0075, 3),
    ]:
        e = RefEnv(cell_size=cell_size, sta_density_per_1m2=density, seed=seed)
        rxpr_real = np.asarray(e._compute_state_real().toarray())
        rxpr_thr = np.asarray(e._compute_state().toarray())
        S, Q, h = e.generate_S_Q_hmax()
        S_real, Q_real, h_real = e.generate_S_Q_hmax(real=True)

        K = e.n_sta
        rng = np.random.default_rng(0)
        Ztest = 8
        z = rng.integers(0, Ztest, size=K)
        sinr = e.evaluate_sinr(z, Ztest)
        bler = e.evaluate_bler(z, Ztest)

        np.savez_compressed(
            os.path.join(OUT, f"{name}.npz"),
            cell_size=cell_size, density=density, seed=seed,
            n_sta=e.n_sta, n_ap=e.n_ap, min_sinr=e._compute_min_sinr(),
            sta_locs=e.sta_locs, ap_locs=e.ap_locs,
            rxpr_real=rxpr_real, rxpr_thr=rxpr_thr,
            S=np.asarray(S.toarray()), Q=np.asarray(Q.toarray()), h_max=np.asarray(h),
            S_real=np.asarray(S_real.toarray()), Q_real=np.asarray(Q_real.toarray()),
            h_max_real=np.asarray(h_real),
            z_test=z, Z_test=Ztest, sinr=sinr, bler=bler,
        )
        print(f"{name}: K={K} A={e.n_ap} nnz(S)={np.count_nonzero(S.toarray())} "
              f"nnz(Q)={np.count_nonzero(Q.toarray())}")

    # ---------------- MMW fixture: trajectory on the small scenario ----------
    np.random.seed(0)
    e = RefEnv(cell_size=5, sta_density_per_1m2=0.0075, seed=1)
    state = e.generate_S_Q_hmax()

    bs = RefBS()
    alg = RefMMW(nit=150, eta=0.05, log_gap=True)
    bs.feasibility_check_alg = alg
    z_vec, Z_fin, rem = bs.run(state)
    gap_log = alg.LOGGED_NP_DATA.get("gap")  # rows: g, it, t, UB, LB, UB-LB
    bler = e.evaluate_bler(z_vec, Z_fin)

    lb, ub = bs.set_bounds(state)
    np.savez_compressed(
        os.path.join(OUT, "mmw_small.npz"),
        S=np.asarray(state[0].toarray()), Q=np.asarray(state[1].toarray()),
        h_max=np.asarray(state[2]),
        lb=lb, ub=ub, Z_fin=Z_fin, remainder=rem, z_vec=z_vec,
        gap_log=gap_log if gap_log is not None else np.zeros((0, 6)),
        nit=150, eta=0.05, bler=bler,
    )
    print(f"mmw_small: Z_fin={Z_fin} rem={rem} lb={lb} ub={ub} "
          f"UB_final={gap_log[-1, 3]:.4f} LB_final={gap_log[-1, 4]:.4f} "
          f"mean_bler={bler.mean():.3e}")


if __name__ == "__main__":
    main()
