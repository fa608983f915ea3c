"""A/B bench: user-ordering (raster vs hilbert) effect on the block-native
MMW iteration at K~100k (VERDICT r4 task 2 — block fill is the top perf
lever; the ordering directly multiplies it).

Writes REORDER_BENCH.json with fill %, streamed GB/iter, achieved GB/s and
ms/iter for each ordering at the production block size (128x128, bf16).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

print = functools.partial(print, flush=True)


def run_one(jax, order, cell=183, nit=30, lanczos_m=8, block=128):
    block_t = tuple(block) if isinstance(block, (tuple, list)) else block
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    S, Q, h = generate_large_state_csr(cell, 75e-4, seed=0, order=order)
    K = S.shape[0]
    ell = jax.device_put(ell_from_scipy(S, Q, h))
    ops = bcsr_operands_from_state(S, Q, block=block_t, dtype=jnp.bfloat16,
                                   store_transpose=True)
    ops = jax.device_put(ops)
    jax.block_until_ready(ops.s_blocks.blocks)

    lb = int(np.diff(Q.indptr).max()) + 1
    Z = float(lb + 4)
    D_pad = ((int(Z) * 2 + 15) // 16) * 16

    fn = jax.jit(lambda e, k, b: mmw_solve_ell(
        e, Z, nit=nit, eta=0.05, D_pad=D_pad, rank_pad=D_pad, key=k,
        lanczos_m=lanczos_m, bcsr=b))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = fn(ell, key, ops)
    float(out.ub_final)
    print(f"[{order}] compile+first {time.time()-t0:.1f}s "
          f"ub={float(out.ub_final):.4f}")

    times = []
    for i in range(3):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = fn(ell, k, ops)
        float(out.ub_final)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    per_it = t / nit

    nnz = int(S.nnz)
    n_spmm = 2 * lanczos_m + 4
    blk_bytes = (int(ops.s_blocks.blocks.size)
                 * ops.s_blocks.blocks.dtype.itemsize)
    streamed = n_spmm * blk_bytes
    rec = {
        "order": order,
        "block": list(block) if isinstance(block, (tuple, list)) else block,
        "K": K,
        "nnz": nnz,
        "Z": Z,
        "D_pad": D_pad,
        "maxblk": int(ops.s_blocks.bcols.shape[1]),
        "block_fill_pct": round(100 * nnz / ops.s_blocks.blocks.size, 2),
        "ms_per_iter": round(per_it * 1e3, 3),
        "iters_per_sec": round(nit / t, 2),
        "streamed_gb_per_iter": round(streamed / 1e9, 2),
        "achieved_gbps": round(streamed / per_it / 1e9, 1),
        "ub_final": round(float(out.ub_final), 4),
    }
    print(f"[{order}] {rec}")
    return rec


def main():
    import jax

    out = {"device": jax.devices()[0].device_kind,
           "config": "cell=183 rho=75e-4 nit=30 m=8 bf16",
           "runs": []}
    for order, block in (("raster", 128), ("hilbert", 128),
                         ("hilbert", (8, 128)), ("hilbert", (16, 128)),
                         ("hilbert", (32, 128))):
        out["runs"].append(run_one(jax, order, block=block))
    best = min(out["runs"], key=lambda r: r["ms_per_iter"])
    out["best"] = {k: best[k] for k in ("order", "block", "ms_per_iter")}
    out["speedup_best_vs_raster128"] = round(
        out["runs"][0]["ms_per_iter"] / best["ms_per_iter"], 3)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "REORDER_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
