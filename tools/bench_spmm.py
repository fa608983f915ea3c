"""SpMM backend shoot-out on the real TPU: XLA ELL gather vs Pallas ELL vs
BCSR block matmuls, on genuine generated interference graphs.

Decides the Pallas kernel's fate (VERDICT r2 #6): the winner carries the
gather path of mmw_solve_ell; a loser gets deleted.  Writes SPMM_BENCH.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

print = functools.partial(print, flush=True)


def bench_one(fn, args, reps=10):
    """Median wall time of ``float(sum(fn(*args)))``.

    On the tunneled axon device, block_until_ready on a large device output
    can return before execution completes; reducing to a scalar and pulling
    it to host is the only reliable completion barrier.  The benched fns are
    therefore wrapped to end in jnp.sum.
    """
    float(fn(*args))                      # compile + warm
    float(fn(*args))                      # absorb any deferred first-run cost
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main(cells=(60, 183), D=64, reps=10, block_rows=256):
    import jax
    import jax.numpy as jnp

    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_from_csr
    from sig_sdp_mmw_tpu.core.ell import build_st_csr
    from sig_sdp_mmw_tpu.ops.ell import ell_spmm

    recs = []
    for cell in cells:
        S, Q, h = generate_large_state_csr(cell, 75e-4, seed=0)
        K = S.shape[0]
        ell = ell_from_scipy(S, Q, h)
        St = build_st_csr(S, Q)
        nnz = St.nnz
        print(f"K={K} nnz(St)={nnz} degS={ell.s_cols.shape[1]} Kp={ell.Kp}")

        V = jax.random.normal(jax.random.PRNGKey(0), (ell.Kp, D), jnp.float32)
        ell = jax.device_put(ell)
        V = jax.device_put(V)
        jax.block_until_ready(V)

        rec = {"K": K, "Kp": ell.Kp, "nnz": int(nnz), "D": D, "ms": {}}

        f_xla = jax.jit(lambda c, v, x: jnp.sum(ell_spmm(c, v, x)))
        t = bench_one(f_xla, (ell.s_cols, ell.s_vals, V), reps)
        rec["ms"]["ell_xla"] = round(t * 1e3, 3)
        rec["gflops_useful"] = round(2 * nnz * D / 1e9, 3)

        for blk, tag in (((8, 128), "bcsr_8x128"), ((128, 128), "bcsr_128")):
            bell = bcsr_from_csr(St, block=blk,
                                 pad_rows_to=None)
            bell = jax.device_put(bell)
            from sig_sdp_mmw_tpu.ops.bcsr import bcsr_spmm

            nr = bell.nrows
            Vp = jnp.zeros((nr, D), jnp.float32).at[: ell.Kp].set(V) \
                if nr >= ell.Kp else None
            if Vp is None:
                continue
            f_b = jax.jit(lambda b, v: jnp.sum(bcsr_spmm(b, v)))
            t = bench_one(f_b, (bell, Vp), reps)
            rec["ms"][tag] = round(t * 1e3, 3)
            rec[f"{tag}_fill_gflops"] = round(
                2 * bell.blocks.size * D / 1e9, 3)

        print(json.dumps(rec))
        recs.append(rec)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPMM_BENCH.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]).split(":")[0],
                   "results": recs}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs="*", default=[60, 183])
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    a = ap.parse_args()
    main(tuple(a.cells), a.D, a.reps)
