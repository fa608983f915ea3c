"""Convergence-plateau vs problem size (the honest framing of the 1M
"reference gap" question).

The reference's convergence figure (plot_convergence_rho.pdf) shows the
averaged-X max violation reaching ~0.05-0.08 after nit=ceil(1/eta^2)=625
iterations at K=300 — at the ORACLE's min feasible Z.  MMW's convergence
rate is O(sqrt(ln C / T)): the bound grows with the constraint count C, and
the UB is a MAX over C constraints, so the same iteration budget lands on a
higher plateau at larger K regardless of solver quality (measured: the
plateau at K=100k is insensitive to eta 0.02-0.04, f32 vs bf16 blocks,
lanczos_m 8-32 and sketch width 34-68 — LONG_CONV_100K.json,
CONV_PROBE_100K.json).

This tool measures that scaling: for each K, find min-Z with the fast
pipeline, then run the reference-spec convergence (eta=0.04, nit=625) AT
min-Z and record the plateau.  Writes PLATEAU_VS_K.json.
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

print = functools.partial(print, flush=True)


def run_cell(jax, cell, eta=0.04, nit=625, seg=125, nattempt=6):
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.core.ell import ell_slim_from_csr
    from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
    from sig_sdp_mmw_tpu.models.mmw_ell import (mmw_ell_ub_from_carry,
                                                mmw_solve_ell)
    from sig_sdp_mmw_tpu.models.rounding_ell import rounding_native_csr
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    S, Q, h = generate_large_state_csr(cell, 75e-4, seed=0)
    K = S.shape[0]
    slim = jax.device_put(ell_slim_from_csr(S, Q, h))
    ops = jax.device_put(bcsr_operands_from_state(
        S, Q, block=128, dtype=jnp.bfloat16, store_transpose=True))
    jax.block_until_ready(ops.s_blocks.blocks)
    lb = int(np.diff(Q.indptr).max()) + 1
    D_pad = 48
    E = int((Q != 0).sum()) // 2
    C = E + 2 * K                     # constraint count (mmw.py:59-60)

    probe = jax.jit(lambda e, Zt, k, b: mmw_solve_ell(
        e, Zt, nit=60, eta=0.05, D_pad=D_pad, rank_pad=D_pad, key=k,
        lanczos_m=8, bcsr=b, rsvd_iters=1))
    key = jax.random.PRNGKey(11)

    lo, hi = lb, lb + 8
    Z_fin = None
    while lo <= hi:
        mid = (lo + hi + 1) // 2
        out = probe(slim, jnp.float32(mid), jax.random.fold_in(key, mid),
                    ops)
        float(out.ub_final)
        _, _, rem = rounding_native_csr(mid, np.asarray(out.X_half), S, Q,
                                        h, jax.random.fold_in(key, 77 + mid),
                                        nattempt=nattempt)
        print(f"  cell={cell} probe Z={mid} rem={rem}")
        if rem == 0:
            Z_fin = mid
            hi = mid - 1
        else:
            lo = mid + 1

    kw = dict(nit=nit, eta=eta, D_pad=D_pad, rank_pad=D_pad, lanczos_m=8)
    seg_fn = jax.jit(lambda e, Zt, k, b, c, i0: mmw_solve_ell(
        e, Zt, key=k, bcsr=b, carry_in=c, it_start=i0, num_steps=seg,
        return_carry=True, **kw))
    ub_fn = jax.jit(lambda e, Zt, cc, n: mmw_ell_ub_from_carry(e, Zt, cc, n))
    Zt = jnp.float32(Z_fin)
    c = None
    t0 = time.time()
    curve = []
    for i0 in range(0, nit, seg):
        c = seg_fn(slim, Zt, key, ops, c, i0)
        u = float(ub_fn(slim, Zt, c, i0 + seg))
        curve.append([i0 + seg, round(u, 4)])
    print(f"  cell={cell} K={K} C={C} Z_fin={Z_fin} "
          f"ub({nit})={curve[-1][1]} [{time.time()-t0:.0f}s]")
    return dict(cell=cell, K=K, C=C, lnC=round(math.log(C), 2),
                lb=lb, Z_fin=int(Z_fin), eta=eta, nit=nit,
                curve=curve, ub_final=curve[-1][1])


def main(cells=(10, 24, 60, 110, 183)):
    import jax

    out = {"device": jax.devices()[0].device_kind, "rows": []}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cell in cells:
        out["rows"].append(run_cell(jax, cell))
        with open(os.path.join(repo, "PLATEAU_VS_K.json"), "w") as f:
            json.dump(out, f, indent=1)
    print("saved PLATEAU_VS_K.json")


if __name__ == "__main__":
    main()
