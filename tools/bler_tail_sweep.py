"""Price the BLER tail against the state threshold ``min_s_n_ratio``.

E2E_LARGE r3 found 9.1% of users above the BLER<=1e-5 design target at
K=100k and attributed most of it to SUB-THRESHOLD interference: received
powers below ``min_s_n_ratio`` are dropped from the solver graph by design
(reference ``env.py:151``), so the solver never constrains their
accumulation.  This sweep makes that mechanism a quantified design trade:
lower the threshold -> denser graph -> fewer unmodeled interferers -> a
smaller tail, at a measured state-size / solve-time price.

For each ratio: full pipeline (generate -> ELL+BCSR -> binary-search MMW ->
round -> verify -> full-channel BLER).  Writes BLER_TAIL_SWEEP.json.

Usage: python tools/bler_tail_sweep.py --cell 100 --ratios 0.1 0.03 0.01
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

print = functools.partial(print, flush=True)


def run_one(ratio, cell, rho, seed, nit, eta, nattempt, block):
    import dataclasses

    import jax

    from sig_sdp_mmw_tpu.env.env import EnvParams
    from sig_sdp_mmw_tpu.env.large import LargeEnv
    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.models.mmw_ell import MMWEll
    from sig_sdp_mmw_tpu.models.search import BinarySearchRelaxation
    from sig_sdp_mmw_tpu.models.rounding_ell import verify_assignment_csr

    p = EnvParams(cell_size=cell, sta_density_per_1m2=rho,
                  min_s_n_ratio=ratio)
    env = LargeEnv(cell, rho, seed=seed, params=p)
    rec = {"min_s_n_ratio": ratio}

    t0 = time.time()
    S, Q, h = env.generate_state_csr()
    ell = ell_from_scipy(S, Q, h)
    rec["K"] = S.shape[0]
    rec["nnz_S"] = int(S.nnz)
    rec["degS"] = int(ell.s_cols.shape[1])
    rec["state_mb"] = round(sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(ell)
        if hasattr(x, "dtype")) / 2**20, 1)
    rec["build_s"] = round(time.time() - t0, 1)

    alg = MMWEll(nit=nit, eta=eta, use_bcsr=True, nattempt=nattempt)
    alg.prepare(ell, S, Q, block=block)
    bs = BinarySearchRelaxation()
    bs.feasibility_check_alg = alg
    t0 = time.time()
    z_vec, Z, rem = bs.run(ell)
    rec["solve_s"] = round(time.time() - t0, 1)
    rec["Z"] = int(Z)
    rec["rem"] = int(rem)
    ok, ni, na = verify_assignment_csr(S, Q, h, np.asarray(z_vec)[:ell.K])
    rec["verified"] = dict(ok=bool(ok), interf=int(ni), asso=int(na))

    t0 = time.time()
    bler = env.evaluate_bler(np.asarray(z_vec)[: ell.K], int(Z))
    rec["bler_eval_s"] = round(time.time() - t0, 1)
    rec["bler_mean"] = float(np.mean(bler))
    rec["bler_max"] = float(np.max(bler))
    rec["frac_above_1e-5"] = float(np.mean(bler > 1e-5))
    print(f"ratio={ratio}: K={rec['K']} nnz={rec['nnz_S']} "
          f"degS={rec['degS']} Z={Z} rem={rem} "
          f"frac>1e-5={rec['frac_above_1e-5']:.4f} "
          f"solve={rec['solve_s']}s")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", type=int, default=100)
    ap.add_argument("--rho", type=float, default=75e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nit", type=int, default=150)
    ap.add_argument("--eta", type=float, default=0.05)
    ap.add_argument("--nattempt", type=int, default=10)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--ratios", type=float, nargs="*",
                    default=[0.1, 0.03, 0.01])
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()

    rows = [run_one(r, a.cell, a.rho, a.seed, a.nit, a.eta, a.nattempt,
                    a.block) for r in a.ratios]
    out = {"config": vars(a), "rows": rows,
           "conclusion": None}
    if len(rows) >= 2:
        f0, f1 = rows[0]["frac_above_1e-5"], rows[-1]["frac_above_1e-5"]
        out["conclusion"] = (
            f"lowering min_s_n_ratio {rows[0]['min_s_n_ratio']} -> "
            f"{rows[-1]['min_s_n_ratio']} moves the >1e-5 tail "
            f"{f0:.4f} -> {f1:.4f} at a state cost "
            f"{rows[0]['nnz_S']} -> {rows[-1]['nnz_S']} nnz and solve "
            f"{rows[0]['solve_s']} -> {rows[-1]['solve_s']} s")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    op = a.out or os.path.join(repo, "BLER_TAIL_SWEEP.json")
    with open(op, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {op}")


if __name__ == "__main__":
    main()
