"""Multi-host backend exercised for real: two OS processes joined by
jax.distributed over a local coordinator, forming one 4-device global mesh
(2 virtual CPU devices per process).  SURVEY §5.8."""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    # Hang guard is the communicate(timeout=240) below — pytest-timeout is
    # not installed in this image, so a mark would just warn.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    addr = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]

    env = dict(os.environ)
    # The workers self-configure platform/devices via jax.config; scrub any
    # conflicting inherited settings.
    env.pop("JAX_NUM_CPU_DEVICES", None)

    procs = [subprocess.Popen(
        [sys.executable, worker, addr, "2", str(i), outs[i]],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(2)]
    logs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    recs = [json.load(open(o)) for o in outs]
    for r in recs:
        assert r["nproc"] == 2
        assert r["ndev"] == 4
        # sum(0..3) over the 4 global devices.
        assert r["psum"] == 6.0
    # Both processes computed the same MMW answer over the global mesh,
    # and it matches the single-process answer on the same tiny state.
    assert recs[0]["ub"] == recs[1]["ub"]

    import jax

    from __graft_entry__ import _tiny_state
    from sig_sdp_mmw_tpu.models.mmw import mmw_solve

    st = _tiny_state(K=28, Kp=32, seed=0)
    want = jax.jit(lambda s, k: mmw_solve(s, 5.0, nit=4, eta=0.05, D_pad=16,
                                          rank_pad=16, key=k, lanczos_m=8))(
        st, jax.random.PRNGKey(0))
    np.testing.assert_allclose(recs[0]["ub"], float(want.ub_final),
                               rtol=1e-5)

    # Sparse/BCSR path over the cross-process mesh: both processes agree
    # and match the single-process block-native answer.
    assert recs[0]["sparse_ub"] == recs[1]["sparse_ub"]
    import scipy.sparse

    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell
    from sig_sdp_mmw_tpu.ops.bcsr import bcsr_operands_from_state

    S = scipy.sparse.csr_matrix(np.asarray(st.S, np.float64)[:28, :28])
    Q = scipy.sparse.csr_matrix(np.asarray(st.Q, np.float64)[:28, :28])
    h = np.asarray(st.h_max, np.float64)[:28]
    ell = ell_from_scipy(S, Q, h, pad_rows_to=32)
    ops = bcsr_operands_from_state(S, Q, block=(8, 8), pad_rows_to=32)
    swant = jax.jit(lambda e, k, b: mmw_solve_ell(
        e, 5.0, nit=4, eta=0.05, D_pad=16, rank_pad=16, key=k, lanczos_m=8,
        bcsr=b))(ell, jax.random.PRNGKey(0), ops)
    np.testing.assert_allclose(recs[0]["sparse_ub"], float(swant.ub_final),
                               rtol=1e-4)
