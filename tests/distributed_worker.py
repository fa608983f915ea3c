"""Worker process for the multi-host (2-process) jax.distributed test.

Launched by tests/test_distributed.py with argv:
    distributed_worker.py <coordinator_addr> <num_procs> <proc_id> <out_json>

Each process owns 2 virtual CPU devices; together they form a 4-device
global mesh.  Validates that (a) init_distributed wires the processes into
one JAX runtime, (b) a cross-process psum sees every device, and (c) one
tiny MMW solve over the global mesh matches the single-process answer.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(addr: str, n: int, pid: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from sig_sdp_mmw_tpu.parallel.distributed import (
        init_distributed, make_global_mesh)

    init_distributed(coordinator_address=addr, num_processes=n,
                     process_id=pid)
    assert jax.process_count() == n, jax.process_count()
    assert len(jax.devices()) == 2 * n          # global device view

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_global_mesh(batch_size=1)       # graph axis = all devices
    ndev = len(jax.devices())

    # (b) cross-process reduction: one distinct value per device.
    spec = NamedSharding(mesh, P(("batch", "graph")))
    x = jax.make_array_from_callback(
        (ndev,), spec,
        lambda idx: np.arange(ndev, dtype=np.float32)[idx])
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    psum_val = float(np.asarray(
        multihost_utils.process_allgather(total, tiled=True)).ravel()[0])

    # (c) a tiny replicated MMW solve over the global mesh: every process
    # must converge to the single-process answer.
    from __graft_entry__ import _tiny_state
    from sig_sdp_mmw_tpu.models.mmw import mmw_solve

    st = _tiny_state(K=28, Kp=32, seed=0)
    rep = NamedSharding(mesh, P())
    st = jax.tree.map(
        lambda a: jax.make_array_from_callback(
            a.shape, rep, lambda idx: np.asarray(a)[idx])
        if hasattr(a, "shape") else a, st)
    key = jax.random.PRNGKey(0)
    out = jax.jit(lambda s, k: mmw_solve(s, 5.0, nit=4, eta=0.05, D_pad=16,
                                         rank_pad=16, key=k, lanczos_m=8))(
        st, key)
    ub = float(np.asarray(
        multihost_utils.process_allgather(out.ub_final, tiled=True)).ravel()[0])

    # (d) the sparse BLOCK-NATIVE (ELL + BCSR) path over the cross-process
    # mesh: block rows sharded across the global graph axis, GSPMD inserts
    # the cross-process collectives for the block gathers.
    import scipy.sparse

    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    st0 = _tiny_state(K=28, Kp=32, seed=0)
    S = scipy.sparse.csr_matrix(np.asarray(st0.S, np.float64)[:28, :28])
    Q = scipy.sparse.csr_matrix(np.asarray(st0.Q, np.float64)[:28, :28])
    h = np.asarray(st0.h_max, np.float64)[:28]
    ell = ell_from_scipy(S, Q, h, pad_rows_to=32)
    ops = bcsr_operands_from_state(S, Q, block=(8, 8), pad_rows_to=32)
    Kbr = ops.s_blocks.Kb

    def put(a, shard_rows):
        spec = NamedSharding(
            mesh, P(("batch", "graph"), *([None] * (a.ndim - 1)))) \
            if shard_rows else rep
        return jax.make_array_from_callback(
            a.shape, spec, lambda idx, _a=a: np.asarray(_a)[idx])

    ops_sh = jax.tree.map(
        lambda a: put(a, a.ndim >= 1 and a.shape[0] == Kbr)
        if hasattr(a, "shape") else a, ops)
    ell_r = jax.tree.map(
        lambda a: put(a, False) if hasattr(a, "shape") else a, ell)
    sout = jax.jit(lambda e, k, b: mmw_solve_ell(
        e, 5.0, nit=4, eta=0.05, D_pad=16, rank_pad=16, key=k, lanczos_m=8,
        bcsr=b))(ell_r, key, ops_sh)
    sparse_ub = float(np.asarray(multihost_utils.process_allgather(
        sout.ub_final, tiled=True)).ravel()[0])

    with open(out_path, "w") as f:
        json.dump(dict(pid=pid, nproc=jax.process_count(),
                       ndev=len(jax.devices()), psum=psum_val, ub=ub,
                       sparse_ub=sparse_ub), f)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
