"""A/B the full block-native solver iteration with the flat-Pallas SpMM
backend vs the ELL dot_general backend at K~100k on the real TPU.
Writes FLAT_SOLVER_AB.json; decides bench.py's production backend.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

print = functools.partial(print, flush=True)


def main(cell=183, nit=30, lanczos_m=8):
    import jax
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.core.ell import ell_slim_from_csr
    from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    S, Q, h = generate_large_state_csr(cell, 75e-4, seed=0)
    K = S.shape[0]
    slim = jax.device_put(ell_slim_from_csr(S, Q, h))
    lb = int(np.diff(Q.indptr).max()) + 1
    Z = float(lb + 4)
    D_pad = ((int(Z) * 2 + 15) // 16) * 16
    key = jax.random.PRNGKey(0)
    out = {"K": K, "Z": Z, "nit": nit, "runs": []}

    for name, kw in (("ell", {}), ("flat_G8", {"flat_group": 8}),
                     ("flat_G16", {"flat_group": 16})):
        ops = jax.device_put(bcsr_operands_from_state(
            S, Q, block=128, dtype=jnp.bfloat16, store_transpose=True,
            **kw))
        jax.block_until_ready(ops.s_blocks.blocks)
        fn = jax.jit(lambda e, k, b: mmw_solve_ell(
            e, Z, nit=nit, eta=0.05, D_pad=D_pad, rank_pad=D_pad, key=k,
            lanczos_m=lanczos_m, bcsr=b))
        t0 = time.time()
        r = fn(slim, key, ops)
        ub = float(r.ub_final)
        compile_s = time.time() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            r = fn(slim, jax.random.fold_in(key, i), ops)
            float(r.ub_final)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        rec = {"backend": name, "ms_per_iter": round(t / nit * 1e3, 2),
               "it_per_s": round(nit / t, 2), "ub": round(ub, 4),
               "compile_s": round(compile_s, 1)}
        print(rec)
        out["runs"].append(rec)
        del ops

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "FLAT_SOLVER_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved FLAT_SOLVER_AB.json")


if __name__ == "__main__":
    main()
