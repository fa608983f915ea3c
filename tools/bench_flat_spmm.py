"""Microbench: flat block-CSR Pallas SpMM vs the ELL dot_general SpMM at
K~100k on the real TPU (VERDICT r4 tasks 2+3: kill the ELL padding AND beat
the fused-XLA path).  Writes FLAT_SPMM_BENCH.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

print = functools.partial(print, flush=True)


def main(cell=183, D=48, iters=30, orders=("hilbert",),
         groups=(4, 8, 16, 32)):
    import jax
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.core.ell import build_st_csr
    from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
    from sig_sdp_mmw_tpu.ops.bcsr import (bcsr_from_csr, bcsr_spmm,
                                          bsr_flat_from_csr,
                                          bsr_spmm_pallas_flat,
                                          bsr_spmm_pallas_vres)

    out = {"device": jax.devices()[0].device_kind, "D": D, "runs": []}
    rng = np.random.default_rng(0)

    for order in orders:
        S, Q, h = generate_large_state_csr(cell, 75e-4, seed=0, order=order)
        St = build_st_csr(S, Q)
        K = St.shape[0]
        nnz = St.nnz
        Kp = ((K + 127) // 128) * 128
        V = jnp.asarray(rng.standard_normal((Kp, D)).astype(np.float32))

        def bench(fn, *args):
            r = fn(*args)
            float(r[0, 0])          # scalar pull = reliable barrier here
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    r = fn(*args)
                float(r[0, 0])
                ts.append((time.perf_counter() - t0) / iters)
            return float(np.median(ts)), r

        # ELL baseline (bf16 blocks, production config)
        ell = bcsr_from_csr(St, block=128, pad_rows_to=Kp, dtype=np.float32)
        ell = jax.device_put(jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            ell))
        t_ell, r_ell = bench(jax.jit(bcsr_spmm), ell, V)
        ell_bytes = int(ell.blocks.size) * 2
        rec = {"order": order, "impl": "ell_dot_general",
               "stored_mb": round(ell_bytes / 1e6, 1),
               "ms": round(t_ell * 1e3, 3),
               "eff_gbps": round(ell_bytes / t_ell / 1e9, 1)}
        print(rec)
        out["runs"].append(rec)
        ref = np.asarray(r_ell)

        for G in groups:
            flat = bsr_flat_from_csr(St, block=128, group=G,
                                     pad_rows_to=Kp, dtype=np.float32)
            flat = jax.device_put(jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, flat))
            for name, fn in (("flat_pallas", bsr_spmm_pallas_flat),
                             ("vres_pallas", bsr_spmm_pallas_vres)):
                try:
                    t, r = bench(fn, flat, V)
                except Exception as exc:  # noqa: BLE001
                    print(f"{name}_G{G}: {type(exc).__name__}: "
                          f"{str(exc)[:200]}")
                    continue
                err = float(np.abs(np.asarray(r) - ref).max()
                            / max(np.abs(ref).max(), 1e-9))
                fbytes = int(flat.blocks.size) * 2
                rec = {"order": order, "impl": f"{name}_G{G}",
                       "nsteps": int(flat.nsteps),
                       "stored_mb": round(fbytes / 1e6, 1),
                       "ms": round(t * 1e3, 3),
                       "eff_gbps": round(fbytes / t / 1e9, 1),
                       "rel_err_vs_ell": round(err, 6)}
                print(rec)
                out["runs"].append(rec)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "FLAT_SPMM_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved FLAT_SPMM_BENCH.json")


if __name__ == "__main__":
    main()
