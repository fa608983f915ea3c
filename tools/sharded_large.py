"""Certify the sharded BLOCK-NATIVE sparse solve at representative scale.

Round-3 gap (VERDICT item 3): graph-sharding was only ever exercised at toy
shapes (Kp<=64).  This tool runs the REAL pipeline — KD-tree scenario
generation, EllState + BCSR operands, block-native MMW, greedy rounding,
independent CSR verification — at K~30k-100k on the 8-virtual-device CPU
mesh, with

* per-device byte accounting of every sharded array (proof that the block
  arrays — the O(nnz) memory — actually partition across the graph axis,
  the single-chip OOM escape hatch), and
* answer equality vs the single-device run (GSPMD collectives only).

Usage: python tools/sharded_large.py --cell 100        # K=30,000
Writes SHARDED_LARGE.json.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print = functools.partial(print, flush=True)


def main(cell=100, rho=75e-4, seed=0, nit=30, eta=0.05, block=128,
         n_dev=8, graph=4, out_path=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.env.large import LargeEnv
    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
    from sig_sdp_mmw_tpu.models.rounding_ell import (rounding_ell,
                                                     verify_assignment_csr)
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state
    from sig_sdp_mmw_tpu.parallel import make_mesh

    rec = {"config": dict(cell=cell, rho=rho, seed=seed, nit=nit, eta=eta,
                          block=block, n_dev=n_dev, graph_axis=graph),
           "phases_s": {}}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = out_path or os.path.join(repo, "SHARDED_LARGE.json")

    t0 = time.time()
    env = LargeEnv(cell, rho, seed=seed)
    S, Q, h = env.generate_state_csr()
    K = S.shape[0]
    rec["K"] = K
    rec["nnz_S"] = int(S.nnz)
    # Pad so both the ELL row count and the BCSR block-row count divide the
    # graph mesh axis (device_put requires exact divisibility).
    import math

    bb = block if isinstance(block, int) else block[0]
    unit = bb * graph
    nr = ((K + unit - 1) // unit) * unit
    ell = ell_from_scipy(S, Q, h, pad_rows_to=nr)
    ops = bcsr_operands_from_state(S, Q, block=block, pad_rows_to=nr)
    rec["phases_s"]["build"] = round(time.time() - t0, 1)
    print(f"build: K={K} nnz={S.nnz} Kb={ops.s_blocks.Kb} "
          f"[{rec['phases_s']['build']}s]")

    lb = int(np.diff(Q.indptr).max()) + 1
    Z = float(lb + 4)
    D_pad = ((int(Z) * 2 + 15) // 16) * 16
    rec["Z"] = Z
    rec["D_pad"] = D_pad

    mesh = make_mesh(n_dev, batch_size=n_dev // graph)
    Kbr = ops.s_blocks.Kb
    Kp = ell.Kp
    nrows = ops.s_blocks.nrows

    def shard_leaf(x):
        # Block-row-indexed arrays shard on the graph axis; per-row [Kp,*]
        # ELL arrays likewise; edge vectors + maps replicate.  (GSPMD
        # handles non-divisible leading dims by padding the last shard.)
        nd = getattr(x, "ndim", 0)
        if nd >= 1 and x.shape[0] in (Kbr, Kp, nrows):
            return jax.device_put(
                x, NamedSharding(mesh, P("graph", *([None] * (nd - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    t0 = time.time()
    ops_sh = jax.tree.map(shard_leaf, ops)
    ell_sh = jax.tree.map(shard_leaf, ell)
    rec["phases_s"]["shard"] = round(time.time() - t0, 1)

    # Per-device byte accounting over every sharded leaf.
    per_dev = {}
    sharded_bytes = 0
    total_bytes = 0
    for leaf in jax.tree.leaves((ops_sh, ell_sh)):
        if not hasattr(leaf, "addressable_shards"):
            continue
        total_bytes += leaf.nbytes
        nsh = {s.data.nbytes for s in leaf.addressable_shards}
        if len({s.device for s in leaf.addressable_shards}) > 1 \
                and leaf.nbytes > max(nsh) * 1.5:
            sharded_bytes += leaf.nbytes
        for s in leaf.addressable_shards:
            d = str(s.device)
            per_dev[d] = per_dev.get(d, 0) + s.data.nbytes
    rec["bytes_total_mb"] = round(total_bytes / 2**20, 1)
    rec["bytes_sharded_mb"] = round(sharded_bytes / 2**20, 1)
    rec["bytes_per_device_mb"] = {
        d: round(v / 2**20, 1) for d, v in sorted(per_dev.items())}
    mx = max(per_dev.values())
    mn = min(per_dev.values())
    rec["device_balance"] = round(mn / mx, 3)
    print(f"shard: total={rec['bytes_total_mb']}MB "
          f"sharded={rec['bytes_sharded_mb']}MB per-dev="
          f"{rec['bytes_per_device_mb']} balance={rec['device_balance']}")

    key = jax.random.PRNGKey(0)
    fn = jax.jit(lambda e, k, b: mmw_solve_ell(
        e, Z, nit=nit, eta=eta, D_pad=D_pad, rank_pad=D_pad, key=k, bcsr=b))

    t0 = time.time()
    out_sh = fn(ell_sh, key, ops_sh)
    ub_sh = float(out_sh.ub_final)
    rec["phases_s"]["solve_sharded"] = round(time.time() - t0, 1)
    print(f"sharded solve: ub={ub_sh:.4f} "
          f"[{rec['phases_s']['solve_sharded']}s]")

    t0 = time.time()
    out_1 = fn(ell, key, ops)
    ub_1 = float(out_1.ub_final)
    rec["phases_s"]["solve_single"] = round(time.time() - t0, 1)
    rec["ub_sharded"] = ub_sh
    rec["ub_single"] = ub_1
    dX = float(np.max(np.abs(np.asarray(out_sh.X_half)
                             - np.asarray(out_1.X_half))))
    rec["max_abs_dX_half"] = dX
    rec["equal"] = bool(abs(ub_sh - ub_1) < 1e-3 and dX < 1e-3)
    print(f"single solve: ub={ub_1:.4f} dX={dX:.2e} equal={rec['equal']} "
          f"[{rec['phases_s']['solve_single']}s]")

    # End-to-end: round the SHARDED solve's factor, verify on host CSR.
    # The greedy scan runs in the native C++ loop on the gathered factor —
    # sub-second at any K (the r4 sharded run spent 1522 s scanning on the
    # virtual mesh; the scan is sequential host work, not mesh work).
    from sig_sdp_mmw_tpu.models.rounding_ell import rounding_native_csr

    t0 = time.time()
    z_vec, _, rem = rounding_native_csr(int(Z), np.asarray(out_sh.X_half),
                                        S, Q, h, jax.random.PRNGKey(7),
                                        nattempt=3)
    rec["rounding_rem"] = int(rem)
    ok, ni, na = verify_assignment_csr(S, Q, h, z_vec)
    rec["verified"] = dict(ok=bool(ok), interf=int(ni), asso=int(na))
    rec["phases_s"]["rounding"] = round(time.time() - t0, 1)
    print(f"rounding: rem={rem} verify={rec['verified']} "
          f"[{rec['phases_s']['rounding']}s]")

    rec["total_s"] = round(sum(rec["phases_s"].values()), 1)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_path}")
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", type=int, default=100)
    ap.add_argument("--rho", type=float, default=75e-4)
    ap.add_argument("--nit", type=int, default=30)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--graph", type=int, default=4)
    ap.add_argument("--n-dev", type=int, default=8)
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()
    main(a.cell, a.rho, nit=a.nit, block=a.block, graph=a.graph,
         n_dev=a.n_dev, out_path=a.out)
