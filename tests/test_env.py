"""Environment layer parity tests against golden fixtures generated from the
reference implementation (tools/make_golden_fixtures.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sig_sdp_mmw_tpu.env import phy
from sig_sdp_mmw_tpu.env.env import (
    EnvParams,
    WirelessEnv,
    ap_grid,
    evaluate_bler_from_sinr,
    evaluate_sinr_from_rxpr,
    rxpr_unthresholded,
    state_arrays_from_rxpr,
    threshold_rxpr,
)


def params_for(fix):
    return EnvParams(cell_size=int(fix["cell_size"]),
                     sta_density_per_1m2=float(fix["density"]))


# ---------------------------------------------------------------------------
# PHY scalar parity
# ---------------------------------------------------------------------------

def test_min_sinr_matches_reference(env_small):
    p = params_for(env_small)
    assert p.min_sinr == pytest.approx(float(env_small["min_sinr"]), rel=1e-9)


def test_polyanskiy_matches_scipy():
    import scipy.stats
    import math

    for snr in [0.5, 2.0, 10.0, 100.0]:
        L, B, T = 800.0, 5e6, 1.25e-4
        nu = -L * math.log(2.0) + B * T * math.log(1 + snr)
        do = math.sqrt(B * T * (1.0 - 1.0 / (1.0 + snr) ** 2))
        want = scipy.stats.norm.sf(nu / do)
        got = float(phy.polyanskiy_model(jnp.float64(snr), L, B, T))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-300)


# ---------------------------------------------------------------------------
# Channel-state parity: given the reference's STA/AP geometry, our rxpr/S/Q/h
# must match the reference's to float32 tolerance.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fix_name", ["env_small", "env_mid"])
def test_rxpr_and_state_match_reference(fix_name, request):
    fix = request.getfixturevalue(fix_name)
    p = params_for(fix)
    sta = jnp.asarray(fix["sta_locs"], dtype=jnp.float64)
    aps = jnp.asarray(fix["ap_locs"], dtype=jnp.float64)

    rxpr = rxpr_unthresholded(sta, aps, p)
    np.testing.assert_allclose(np.asarray(rxpr), fix["rxpr_real"], rtol=2e-5)

    rxpr_thr = threshold_rxpr(rxpr, p)
    np.testing.assert_allclose(np.asarray(rxpr_thr), fix["rxpr_thr"], rtol=2e-5)

    S, Q, h, asso = state_arrays_from_rxpr(rxpr_thr, p)
    np.testing.assert_allclose(np.asarray(S), fix["S"], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Q), fix["Q"], atol=0)
    np.testing.assert_allclose(np.asarray(h), fix["h_max"], rtol=2e-5, atol=1e-7)


def test_ap_grid_matches_reference(env_small):
    p = params_for(env_small)
    np.testing.assert_allclose(np.asarray(ap_grid(p)), env_small["ap_locs"],
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Evaluator parity: same assignment -> same SINR/BLER as the reference's
# slot-loop + AP-winner implementation.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fix_name", ["env_small", "env_mid"])
def test_evaluate_sinr_bler_match_reference(fix_name, request):
    fix = request.getfixturevalue(fix_name)
    p = params_for(fix)
    rxpr_real = jnp.asarray(fix["rxpr_real"], dtype=jnp.float64)
    z = jnp.asarray(fix["z_test"].astype(np.int32))

    sinr = np.asarray(evaluate_sinr_from_rxpr(rxpr_real, z, p))
    ref_sinr = fix["sinr"]

    # Within an association clique, power control makes all same-slot users'
    # SINR mathematically identical, so the reference's per-(AP,slot) argmax
    # winner is decided by float rounding noise.  Compare the value multiset
    # (exact up to tolerance) and the winner count instead of positions.
    np.testing.assert_allclose(np.sort(sinr), np.sort(ref_sinr), rtol=2e-5)
    assert np.sum(sinr == 1e-3) == np.sum(ref_sinr == 1e-3)

    # Non-degenerate entries (unique within their group) must match in place.
    mismatched = ~np.isclose(sinr, ref_sinr, rtol=2e-5)
    assert mismatched.mean() < 0.1

    bler = np.asarray(evaluate_bler_from_sinr(jnp.asarray(sinr), p))
    np.testing.assert_allclose(np.sort(bler), np.sort(fix["bler"]), rtol=1e-4,
                               atol=1e-12)


# ---------------------------------------------------------------------------
# Generator statistics: our own sampled scenarios look like the reference's.
# ---------------------------------------------------------------------------

def test_wireless_env_structure():
    e = WirelessEnv(cell_size=5, sta_density_per_1m2=0.0075, seed=0)
    assert e.n_sta == 75 and e.n_ap == 25
    st = e.generate_state()
    K = st.K
    S = np.asarray(st.S)[:K, :K]
    Q = np.asarray(st.Q)[:K, :K]
    h = np.asarray(st.h_max)[:K]

    # Q is a symmetric 0/1 clique matrix with zero diagonal.
    assert np.array_equal(Q, Q.T)
    assert set(np.unique(Q)) <= {0.0, 1.0}
    assert np.all(np.diag(Q) == 0)
    # Power control: own-AP budget h = diag(S)/min_sinr - 1 ~ txp_offset - 1.
    assert np.all(np.diag(S) > 0)
    np.testing.assert_allclose(h, np.diag(S) / e.min_sinr - 1.0, rtol=1e-5)
    assert np.all(h > 0)
    # Sparsity: thresholding keeps the graph sparse.
    density = np.count_nonzero(S) / (K * K)
    assert density < 0.5


def test_mobility_moves_users_and_respects_bounds():
    e = WirelessEnv(cell_size=5, sta_density_per_1m2=0.0075, seed=0)
    locs0 = np.asarray(e.sta_locs).copy()
    e.rand_user_mobility(mobility_in_meter_s=1.0, t_us=1e6, resolution_us=1e5)
    locs1 = np.asarray(e.sta_locs)
    moved = np.linalg.norm(locs1 - locs0, axis=1)
    # 1 m/s for 1 s -> at most ~1 m of motion, most users should move.
    assert np.median(moved) > 0.0
    assert np.max(moved) <= 1.0 + 1e-5
    assert np.all(locs1 >= 0.0) and np.all(locs1 <= e.params.grid_edge)
