"""Sparse (ELL) rounding / verification / bounds / search: must reproduce the
dense backend exactly where both run (the dense path is the reference-parity
oracle, so exact agreement here transfers the parity evidence to the sparse
path)."""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sig_sdp_mmw_tpu.core.ell import ell_from_sig_state
from sig_sdp_mmw_tpu.core.problem import state_from_arrays
from sig_sdp_mmw_tpu.models.mmw import mmw_solve
from sig_sdp_mmw_tpu.models.mmw_ell import MMWEll, mmw_solve_ell
from sig_sdp_mmw_tpu.models.rounding import rounding, verify_assignment
from sig_sdp_mmw_tpu.models.rounding_ell import (rounding_ell,
                                                 verify_assignment_ell)
from sig_sdp_mmw_tpu.models.search import BinarySearchRelaxation


@pytest.fixture(scope="module")
def fix():
    return dict(np.load(pathlib.Path(__file__).parent / "fixtures"
                        / "mmw_small.npz"))


@pytest.fixture(scope="module")
def dense_state(fix):
    return state_from_arrays(fix["S"], fix["Q"], fix["h_max"],
                             dtype=jnp.float32)


@pytest.fixture(scope="module")
def ell_state(dense_state):
    return ell_from_sig_state(dense_state)


def test_degree_bounds_parity(dense_state, ell_state):
    assert ell_state.degree_bounds() == dense_state.degree_bounds()
    assert ell_state.asso_lower_bound() == dense_state.asso_lower_bound()


def test_rounding_trajectory_identical(dense_state, ell_state):
    """Same gX + same PRNG key => the ELL greedy must pick the exact same
    slots as the dense greedy (the trajectory-equivalence argument in
    rounding_ell's module docstring, checked bit-for-bit)."""
    K = dense_state.K
    _, ub = dense_state.degree_bounds()
    rng = np.random.default_rng(0)
    for trial in range(3):
        gX = rng.standard_normal((dense_state.Kp, 16)).astype(np.float32)
        gX[K:] = 0.0
        gXe = np.zeros((ell_state.Kp, 16), np.float32)
        gXe[:K] = gX[:K]
        key = jax.random.PRNGKey(trial)
        for Z in (max(2, ub // 2), ub):
            zd, _, rd = rounding(Z, gX, dense_state, key, nattempt=3,
                                 Z_pad=32)
            ze, _, re = rounding_ell(Z, gXe, ell_state, key, nattempt=3,
                                     Z_pad=32)
            assert rd == re
            np.testing.assert_array_equal(zd, ze)


def test_verifier_parity_exact(dense_state, ell_state):
    """verify_assignment_ell must agree with the dense checker on feasibility
    AND on the violation counts, including infeasible assignments."""
    K = dense_state.K
    rng = np.random.default_rng(1)
    for Z in (2, 4, 9, 20):
        for _ in range(4):
            z = rng.integers(0, Z, K)
            assert verify_assignment(dense_state, z) == \
                verify_assignment_ell(ell_state, z)


def test_search_over_ell_state(ell_state, dense_state):
    """End-to-end binary search on the sparse state, solver + rounding +
    bounds all ELL-native; result must be a verified feasible schedule."""
    bs = BinarySearchRelaxation()
    bs.feasibility_check_alg = MMWEll(nit=50, eta=0.05, seed=1)
    z_vec, Z, rem = bs.run(ell_state)
    assert rem == 0
    ok, ni, na = verify_assignment_ell(ell_state, z_vec)
    assert ok, (ni, na)
    # The dense checker agrees on the same assignment.
    assert verify_assignment(dense_state, z_vec)[0]
    lb, ub = ell_state.degree_bounds()
    assert lb <= Z <= ub


def test_ell_gap_lb_matches_dense(dense_state, ell_state, fix):
    """The implicit-operator duality-gap telemetry (UB and LB) must track the
    dense backend's on the shared fixture (same PRNG stream)."""
    Z = float(fix["Z_fin"])
    key = jax.random.PRNGKey(0)
    dense = jax.jit(lambda s, k: mmw_solve(s, Z, nit=30, eta=0.05, D_pad=32,
                                           rank_pad=32, key=k, log_gap=True)
                    )(dense_state, key)
    sparse = jax.jit(lambda s, k: mmw_solve_ell(s, Z, nit=30, eta=0.05,
                                                D_pad=32, rank_pad=32, key=k,
                                                log_gap=True)
                     )(ell_state, key)
    gd = np.asarray(dense.gap_log)
    gs = np.asarray(sparse.gap_log)
    assert gs.shape == (30, 2)
    # UB identical trajectories to float tolerance; LB from a fixed-iteration
    # Lanczos on the same operator (different matvec rounding) — close.
    np.testing.assert_allclose(gs[:, 0], gd[:, 0], atol=2e-3)
    np.testing.assert_allclose(gs[:, 1], gd[:, 1], atol=2e-2)
    # Weak duality: LB <= UB along the whole trajectory.
    assert np.all(gs[:, 1] <= gs[:, 0] + 1e-6)


def test_ell_rounding_after_sparse_solve(ell_state, fix):
    """Fully sparse pipeline at fixture scale: solve + round + verify without
    ever touching the dense [Kp, Kp] state."""
    Z = int(fix["Z_fin"])
    out = jax.jit(lambda s, k: mmw_solve_ell(s, float(Z), nit=150, eta=0.05,
                                             D_pad=32, rank_pad=32, key=k)
                  )(ell_state, jax.random.PRNGKey(1))
    z_vec, _, rem = rounding_ell(Z, out.X_half, ell_state,
                                 jax.random.PRNGKey(2))
    assert rem == 0
    ok, ni, na = verify_assignment_ell(ell_state, z_vec)
    assert ok, (ni, na)
