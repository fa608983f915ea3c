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
    """At high nit the consensus ADMM X must satisfy EVERY SDP constraint
    family to ~1e-3 — oracle-quality feasibility, not ballpark."""
    state, Z = ref_state
    from sig_sdp_mmw_tpu.models.admm import admm_sdp_solve

    X_half, X = admm_sdp_solve(state, float(Z), nit=500, rank_pad=32)
    X = np.asarray(X, dtype=np.float64)
    K = state.K
    Xk = X[:K, :K]

    np.testing.assert_allclose(np.diag(Xk), 1.0, atol=1e-3)
    Q = np.asarray(state.Q)[:K, :K] != 0
    bound = -1.0 / (Z - 1)
    assert np.all(Xk[Q] <= bound + 1e-3)
    # Interference rows (sdp_solver.py:158).
    S = np.asarray(state.S, np.float64)[:K, :K].copy()
    np.fill_diagonal(S, 0.0)
    St = (S - S * Q).T
    h = np.asarray(state.h_max, np.float64)[:K]
    Ssum = St.sum(axis=1)
    v = (St * Xk).sum(axis=1) - (h - Ssum / Z) * Z / (Z - 1)
    assert v.max() <= 1e-3 * max(np.abs(h).max(), 1.0)
    ev = np.linalg.eigvalsh(0.5 * (Xk + Xk.T))
    assert ev.min() > -1e-3


def test_admm_rounding_feasible(ref_state):
    state, Z = ref_state
    alg = ADMMSDPSolver(nit=200)
    ok, gX = alg.run_with_state(0, Z, state)
    assert ok and np.isfinite(np.asarray(gX)).all()
    z_vec, _, rem = alg.rounding(Z, gX, state)
    assert rem == 0
    ok, ni, na = verify_assignment(state, z_vec)
    assert ok, (ni, na)


def test_admm_oracle_decisions_cross_checked(ref_state):
    """Decision-level oracle validation on the fixture's search window
    (VERDICT r2 #1c): at every probed Z the ADMM oracle's feasible/infeasible
    verdict must be corroborated by the MMW solver — an oracle-infeasible Z
    must carry an MMW infeasibility certificate (duality-gap LB > 0) or an
    MMW rounding failure, and an oracle-feasible Z must never be contradicted
    by a positive MMW LB certificate.  This is the check that would catch a
    systematically optimistic or pessimistic oracle, which residual tests
    (above) cannot."""
    import jax

    from sig_sdp_mmw_tpu.models import MMW

    state, Z_fin = ref_state
    from sig_sdp_mmw_tpu.models.admm import admm_sdp_solve

    eps = 1e-2  # certificate threshold on the (scaled) max-violation LB
    for Z in range(max(2, Z_fin - 3), Z_fin + 2):
        oracle = ADMMSDPSolver(nit=500)
        _, gX = oracle.run_with_state(0, Z, state)
        _, _, rem_orc = oracle.rounding(Z, gX, state)

        mm = MMW(nit=300, eta=0.04, seed=0, log_gap=True)
        _, gXm = mm.run_with_state(0, Z, state)
        _, _, rem_mmw = mm.rounding(Z, gXm, state)
        lb_final = float(np.asarray(mm.last_output.gap_log)[-1, 1])

        if rem_orc > 0:
            # Oracle says infeasible: MMW must corroborate via certificate
            # or its own rounding failure.
            assert lb_final > eps or rem_mmw > 0, (Z, rem_orc, lb_final)
        else:
            # Oracle says feasible: MMW must not certify infeasibility.
            assert lb_final <= eps, (Z, lb_final)
    # The known min feasible Z itself must be oracle-feasible.
    oracle = ADMMSDPSolver(nit=500)
    _, gX = oracle.run_with_state(0, Z_fin, state)
    _, _, rem = oracle.rounding(Z_fin, gX, state)
    assert rem == 0


def test_lrp_solver_residuals(ref_state):
    """The projection solver must actually solve the reference LP feasibility
    system (lrp.py:41-51): every constraint-family residual <= 1e-3 at
    nit=500, at the tight Z and at Z+2."""
    from sig_sdp_mmw_tpu.models.lrp import lrp_residuals, lrp_solve

    state, Z = ref_state
    for Zp in (Z, Z + 2):
        P = lrp_solve(state, float(Zp), nit=500, Z_pad=16)
        res = lrp_residuals(state, np.asarray(P), Zp)
        for fam, val in res.items():
            assert val <= 1e-3, (Zp, fam, res)


def test_lrp_solver_rounding(ref_state):
    state, Z = ref_state
    alg = LRPSolver(nit=500)
    ok, P = alg.run_with_state(0, Z + 2, state)
    assert ok
    P_np = np.asarray(P)
    assert np.isfinite(P_np).all()
    assert P_np.min() >= 0.0 and P_np.max() <= 1.0
    # Column sums one for real users over active slots (exact constraint).
    cs = P_np[:, : state.K].sum(axis=0)
    np.testing.assert_allclose(cs, 1.0, atol=1e-3)

    z_vec, _, rem = alg.rounding(Z + 2, P, state)
    assert rem >= 0
    if rem == 0:
        ok, _, _ = verify_assignment(state, z_vec)
        assert ok
