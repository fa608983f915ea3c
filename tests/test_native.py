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
