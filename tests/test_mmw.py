"""MMW solver + rounding + binary search, validated against the reference
trajectory fixture (tools/make_golden_fixtures.py: reference solved the same
state with nit=150, eta=0.05, reaching Z_fin=8, remainder=0)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sig_sdp_mmw_tpu.core.problem import state_from_arrays
from sig_sdp_mmw_tpu.models import (
    MAX_ASSO,
    MAX_GAIN,
    MAX_RAND,
    MMW,
    BinarySearchRelaxation,
    RandSDPSolver,
    SpectralSDPSolver,
)
from sig_sdp_mmw_tpu.models.mmw import mmw_solve
from sig_sdp_mmw_tpu.models.rounding import rounding, verify_assignment


@pytest.fixture(scope="module")
def ref_state(mmw_small_np):
    return state_from_arrays(mmw_small_np["S"], mmw_small_np["Q"],
                             mmw_small_np["h_max"], dtype=jnp.float32)


@pytest.fixture(scope="session")
def mmw_small_np():
    import pathlib

    fix = np.load(pathlib.Path(__file__).parent / "fixtures" / "mmw_small.npz")
    return dict(fix)


def test_mmw_converges_to_reference_gap(ref_state, mmw_small_np):
    """Final max-violation of the averaged X must be in the reference's
    ballpark at the reference's (Z, nit, eta)."""
    Z = int(mmw_small_np["Z_fin"])
    out = jax.jit(
        lambda st, Z, key: mmw_solve(st, Z, nit=150, eta=0.05, D_pad=32,
                                     rank_pad=32, key=key, log_gap=True)
    )(ref_state, float(Z), jax.random.PRNGKey(0))

    ref_gap = mmw_small_np["gap_log"]          # cols: g, it, t, UB, LB, UB-LB
    ref_ub_final = ref_gap[-1, 3]
    ub = float(out.ub_final)
    # Bound: no worse than 1.25x the reference's own final UB on the
    # identical state at identical (Z, nit, eta) — with an absolute +0.15
    # ceiling so the guard stays tight if a future fixture has a large UB.
    assert ub < min(1.25 * ref_ub_final, ref_ub_final + 0.15), (ub, ref_ub_final)

    # UB telemetry decreases substantially from the X0=I start.
    ubs = np.asarray(out.gap_log[:, 0])
    assert ubs[-1] < 0.5 * ubs[2]
    # LB stays below UB (weak duality of the telemetry).
    lbs = np.asarray(out.gap_log[:, 1])
    assert np.all(lbs <= ubs + 1e-3)


def test_mmw_rounding_feasible_at_reference_Z(ref_state, mmw_small_np):
    Z = int(mmw_small_np["Z_fin"])
    alg = MMW(nit=150, eta=0.05, seed=0)
    ok, gX = alg.run_with_state(0, Z, ref_state)
    assert ok
    z_vec, Z_out, rem = alg.rounding(Z, gX, ref_state)
    assert rem == 0
    ok, ni, na = verify_assignment(ref_state, z_vec)
    assert ok, (ni, na)


def test_mmw_deterministic(ref_state):
    out1 = jax.jit(lambda st: mmw_solve(st, 8.0, nit=20, eta=0.05, D_pad=32,
                                        rank_pad=32, key=jax.random.PRNGKey(3))
                   )(ref_state)
    out2 = jax.jit(lambda st: mmw_solve(st, 8.0, nit=20, eta=0.05, D_pad=32,
                                        rank_pad=32, key=jax.random.PRNGKey(3))
                   )(ref_state)
    np.testing.assert_array_equal(np.asarray(out1.X_half), np.asarray(out2.X_half))


def test_binary_search_end_to_end(ref_state, mmw_small_np):
    bs = BinarySearchRelaxation()
    alg = MMW(nit=100, eta=0.05, seed=1)
    bs.feasibility_check_alg = alg
    z_vec, Z, rem = bs.run(ref_state)
    assert rem == 0
    ok, _, _ = verify_assignment(ref_state, z_vec)
    assert ok
    # The reference found Z=8 on this instance; allow +/-1 stochastic slack.
    assert abs(Z - int(mmw_small_np["Z_fin"])) <= 1


def test_bounds_match_reference(ref_state, mmw_small_np):
    bs = BinarySearchRelaxation()
    lb, ub = bs.set_bounds(ref_state)
    assert lb == int(mmw_small_np["lb"])
    assert ub == int(mmw_small_np["ub"])


def test_rand_solver_rounding_needs_more_slots(ref_state):
    """Random factor should be clearly worse than MMW at the reference Z."""
    alg = RandSDPSolver()
    _, gX = alg.run_with_state(0, 8, ref_state)
    _, _, rem = alg.rounding(8, gX, ref_state, nattempt=3)
    # Not necessarily infeasible every seed, but typically worse; just check
    # the plumbing returns sane values.
    assert rem >= 0


def test_spectral_solver_plumbing(ref_state):
    alg = SpectralSDPSolver()
    ok, gX = alg.run_with_state(0, 8, ref_state)
    assert ok and np.isfinite(np.asarray(gX)).all()
    z_vec, Z, rem = alg.rounding(8, gX, ref_state)
    assert rem >= 0


def test_heuristics_feasible_when_unbounded(ref_state):
    for heur in (MAX_GAIN, MAX_ASSO):
        z_vec, ZZ, rem = heur.run(4, ref_state, not_Z_bound=True)
        assert rem == 0, heur.__name__
        ok, ni, na = verify_assignment(ref_state, z_vec)
        assert ok, (heur.__name__, ni, na)
        assert 2 <= ZZ <= ref_state.K

    # Bounded variant at a generous Z should also pack everyone.
    z_vec, ZZ, rem = MAX_GAIN.run(30, ref_state)
    assert rem == 0


def test_max_rand_plumbing(ref_state):
    z_vec, Z, rem = MAX_RAND.run(20, ref_state)
    assert rem >= 0
    if rem == 0:
        ok, _, _ = verify_assignment(ref_state, z_vec)
        assert ok


def test_heuristics_nattempt_matches_single(ref_state):
    """gm.py:29-53: the per-slot attempt loop keeps the longest packing; with
    a deterministic rank every attempt coincides, so nattempt>1 must return
    exactly the nattempt=1 schedule (at nattempt x the work) — the
    reference's own semantics."""
    z1, Z1, r1 = MAX_GAIN.run(30, ref_state, nattempt=1)
    z3, Z3, r3 = MAX_GAIN.run(30, ref_state, nattempt=3)
    assert (Z1, r1) == (Z3, r3)
    np.testing.assert_array_equal(z1, z3)


def test_verify_assignment_detects_violations(ref_state):
    """All users in one slot must violate association constraints."""
    z = np.zeros(ref_state.K, dtype=int)
    ok, ni, na = verify_assignment(ref_state, z)
    assert not ok and na > 0
