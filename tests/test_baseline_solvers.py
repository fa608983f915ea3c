"""ADMM SDP oracle + LP relaxation baselines (jitted, no cvxpy/SCS)."""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from sig_sdp_mmw_tpu.core.problem import state_from_arrays
from sig_sdp_mmw_tpu.models import ADMMSDPSolver, LRPSolver
from sig_sdp_mmw_tpu.models.rounding import verify_assignment


@pytest.fixture(scope="module")
def ref_state():
    fix = np.load(pathlib.Path(__file__).parent / "fixtures" / "mmw_small.npz")
    return state_from_arrays(fix["S"], fix["Q"], fix["h_max"],
                             dtype=jnp.float32), int(fix["Z_fin"])


def test_admm_oracle_constraints(ref_state):
    """After enough iterations the ADMM X must approximately satisfy the SDP
    constraints (diag ~ 1, association entries near the simplex bound, PSD)."""
    state, Z = ref_state
    from sig_sdp_mmw_tpu.models.admm import admm_sdp_solve

    X_half, X = admm_sdp_solve(state, float(Z), nit=300, rank_pad=32)
    X = np.asarray(X, dtype=np.float64)
    K = state.K
    Xk = X[:K, :K]

    np.testing.assert_allclose(np.diag(Xk), 1.0, atol=0.05)
    Q = np.asarray(state.Q)[:K, :K] != 0
    bound = -1.0 / (Z - 1)
    assert np.all(Xk[Q] <= bound + 0.05)
    ev = np.linalg.eigvalsh(0.5 * (Xk + Xk.T))
    assert ev.min() > -0.05


def test_admm_rounding_feasible(ref_state):
    state, Z = ref_state
    alg = ADMMSDPSolver(nit=200)
    ok, gX = alg.run_with_state(0, Z, state)
    assert ok and np.isfinite(np.asarray(gX)).all()
    z_vec, _, rem = alg.rounding(Z, gX, state)
    assert rem == 0
    ok, ni, na = verify_assignment(state, z_vec)
    assert ok, (ni, na)


def test_lrp_solver_rounding(ref_state):
    state, Z = ref_state
    alg = LRPSolver(nit=200)
    ok, P = alg.run_with_state(0, Z + 2, state)
    assert ok
    P_np = np.asarray(P)
    assert np.isfinite(P_np).all()
    assert P_np.min() >= 0.0 and P_np.max() <= 1.0
    # Column sums approximately one for real users over active slots.
    cs = P_np[:, : state.K].sum(axis=0)
    assert abs(np.median(cs) - 1.0) < 0.2

    z_vec, _, rem = alg.rounding(Z + 2, P, state)
    assert rem >= 0
    if rem == 0:
        ok, _, _ = verify_assignment(state, z_vec)
        assert ok
