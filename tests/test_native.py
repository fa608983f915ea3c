"""Native (C++) graph builder vs the Python/scipy reference path.

The native builder (csrc/sig_native.cpp) must produce the exact same sparse
state as env/large.py's scipy path — identical CSR patterns, values to
float64 round-off — because both implement the reference semantics
(sim_src/env/env.py:136-196) over identical user coordinates.
"""

import numpy as np
import pytest

from sig_sdp_mmw_tpu.env.large import generate_large_state_csr
from sig_sdp_mmw_tpu.native import native_available, native_num_threads

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain; python fallback covers")


@pytest.mark.parametrize("cell,seed", [(12, 0), (20, 3), (25, 7)])
def test_native_matches_python_exactly(cell, seed):
    Sp, Qp, hp = generate_large_state_csr(cell, seed=seed, backend="python")
    Sn, Qn, hn = generate_large_state_csr(cell, seed=seed, backend="native")
    np.testing.assert_array_equal(Sp.indptr, Sn.indptr)
    np.testing.assert_array_equal(Sp.indices, Sn.indices)
    np.testing.assert_allclose(Sp.data, Sn.data, rtol=1e-9)
    np.testing.assert_array_equal(Qp.indptr, Qn.indptr)
    np.testing.assert_array_equal(Qp.indices, Qn.indices)
    np.testing.assert_allclose(hp, hn, rtol=1e-9)


def test_native_state_properties():
    S, Q, h = generate_large_state_csr(20, seed=1, backend="native")
    K = S.shape[0]
    assert Q.shape == (K, K)
    # Q is a symmetric 0/1 clique matrix with empty diagonal.
    assert (Q != Q.T).nnz == 0
    assert np.all(Q.diagonal() == 0)
    # h_max = diag(S)/min_sinr - 1 > 0 under power control with offset > 1.
    assert np.all(np.asarray(S.diagonal()).ravel() > 0)
    assert np.all(h > 0)


def test_auto_backend_and_threads():
    assert native_num_threads() >= 1
    S, _, _ = generate_large_state_csr(12, seed=0, backend="auto")
    S2, _, _ = generate_large_state_csr(12, seed=0, backend="python")
    assert (S.indices == S2.indices).all()


# ---- native BCSR operand packer (csrc sig_bcsr_*) --------------------------

def _random_csr(K, density, seed):
    import scipy.sparse
    rng = np.random.default_rng(seed)
    M = scipy.sparse.random(K, K, density=density, random_state=rng,
                            format="csr")
    M.sort_indices()
    return M


@pytest.mark.parametrize("K,density,block", [
    (500, 0.02, (8, 128)), (1111, 0.004, (8, 128)), (300, 0.05, (16, 128))])
def test_bcsr_pack_native_bit_exact(K, density, block):
    from sig_sdp_mmw_tpu.native.builder import bcsr_pack_native
    from sig_sdp_mmw_tpu.ops.bcsr import _bcsr_arrays_np

    M = _random_csr(K, density, seed=K)
    b0, v0, kp0, (ebr, eslot, erloc, ecloc) = _bcsr_arrays_np(
        M, block, dtype=np.float32, return_entry_maps=True)
    b1, v1, kp1, m1 = bcsr_pack_native(M, block, dtype=np.float32,
                                       return_entry_maps=True)
    assert kp0 == kp1
    np.testing.assert_array_equal(b0, b1)
    np.testing.assert_array_equal(v0, v1)
    for a, b in zip((ebr, eslot, erloc, ecloc), m1[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # epos == the flat scatter position s_pos of bcsr_operands_from_state
    Br, Bc = block
    maxblk = b0.shape[1]
    s_pos = (((ebr * Br + erloc) * maxblk + eslot) * Bc + ecloc)
    np.testing.assert_array_equal(s_pos.astype(np.int64),
                                  m1[4].astype(np.int64))


def test_bcsr_pack_native_bf16_matches_xla_cast():
    import jax
    import jax.numpy as jnp
    from sig_sdp_mmw_tpu.native.builder import bcsr_pack_native
    from sig_sdp_mmw_tpu.ops.bcsr import _bcsr_arrays_np

    M = _random_csr(700, 0.01, seed=7)
    _, v0, _ = _bcsr_arrays_np(M, (8, 128), dtype=np.float32)
    _, v1, _ = bcsr_pack_native(M, (8, 128), dtype=jnp.bfloat16)
    ref = np.asarray(jax.jit(lambda x: x.astype(jnp.bfloat16))(
        jnp.asarray(v0)))
    np.testing.assert_array_equal(ref.view(np.uint16),
                                  np.asarray(v1).view(np.uint16))


def test_bcsr_operands_native_path_equals_numpy(monkeypatch):
    """Full operand build, native path forced on, vs the numpy path."""
    import jax.numpy as jnp
    from sig_sdp_mmw_tpu.ops import bcsr as B

    S, Q, _ = generate_large_state_csr(40, seed=2, backend="python")
    monkeypatch.setattr(B, "_NATIVE_PACK_MIN_NNZ", 0)
    o_nat = B.bcsr_operands_from_state(S, Q, block=(8, 128),
                                      dtype=jnp.bfloat16)
    monkeypatch.setattr(B, "_NATIVE_PACK_MIN_NNZ", 1 << 62)
    o_np = B.bcsr_operands_from_state(S, Q, block=(8, 128),
                                     dtype=jnp.bfloat16)
    for f in ["g_src", "g_dst", "s_pos", "q_pos", "q_eidx", "w_edge",
              "q_bcols"]:
        a = np.asarray(getattr(o_nat, f))
        b = np.asarray(getattr(o_np, f))
        assert a.shape == b.shape and np.array_equal(a, b), f
    np.testing.assert_array_equal(
        np.asarray(o_nat.s_blocks.bcols), np.asarray(o_np.s_blocks.bcols))
    np.testing.assert_array_equal(
        np.asarray(o_nat.s_blocks.blocks).view(np.uint16),
        np.asarray(o_np.s_blocks.blocks).view(np.uint16))
