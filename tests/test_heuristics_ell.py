"""Sparse (ELL) heuristics: trajectory equality vs the dense heuristics and
independent feasibility of their assignments."""

import jax.numpy as jnp
import numpy as np
import pytest

from sig_sdp_mmw_tpu.core.ell import ell_from_sig_state
from sig_sdp_mmw_tpu.env import WirelessEnv
from sig_sdp_mmw_tpu.models import (
    MAX_ASSO, MAX_ASSO_ELL, MAX_GAIN, MAX_GAIN_ELL, MAX_RAND_ELL)
from sig_sdp_mmw_tpu.models.rounding_ell import verify_assignment_ell


@pytest.fixture(scope="module", params=[3, 11])
def state_pair(request):
    e = WirelessEnv(cell_size=5, sta_density_per_1m2=75e-4,
                    seed=request.param)
    st = e.generate_S_Q_hmax()
    return st, ell_from_sig_state(st)


def test_pack_matches_dense_with_shared_scores(state_pair):
    """With IDENTICAL scores the user-major ELL pack must reproduce the dense
    slot-major pack's assignment bit-for-bit (the equivalence argument in the
    heuristics_ell module docstring)."""
    import jax

    from sig_sdp_mmw_tpu.models.heuristics import _greedy_pack_slot_major
    from sig_sdp_mmw_tpu.models.heuristics_ell import _pack_by_scores_ell

    st, ell = state_pair
    eye = jnp.eye(st.Kp, dtype=bool)
    scores = jnp.sum(jnp.where(eye, 0.0, st.S).T, axis=1)
    lb, ub = st.degree_bounds()
    key = jax.random.PRNGKey(0)
    for Z in (max(2, lb), (lb + ub) // 2, ub, ub + 4):
        Z_pad = ((max(Z, ub) + 15) // 16) * 16
        zd, ZZd, remd = _greedy_pack_slot_major(st, scores, jnp.int32(Z),
                                                key, Z_pad=Z_pad)
        ze, ZZe, reme = _pack_by_scores_ell(ell, scores, jnp.int32(Z), key,
                                            Z_pad=Z_pad)
        assert int(remd) == int(reme), (Z, int(remd), int(reme))
        assert int(ZZd) == int(ZZe), (Z, int(ZZd), int(ZZe))
        # Assigned slots identical for every assigned user (fallback fills
        # for unassigned users draw from different RNG shapes).
        zd, ze = np.asarray(zd), np.asarray(ze)
        mask = np.asarray(st.mask)
        if int(remd) == 0:
            np.testing.assert_array_equal(zd[mask], ze[mask])


@pytest.mark.parametrize("dense_cls,ell_cls", [(MAX_GAIN, MAX_GAIN_ELL),
                                               (MAX_ASSO, MAX_ASSO_ELL)])
def test_score_heuristic_matches_dense(state_pair, dense_cls, ell_cls):
    """End-metric equality of the class-level runs.  Scores are computed by
    different summation orders (dense [Kp,Kp] row sums vs ELL gather sums),
    so exact-tie users may swap slots; the packing quality (rem, ZZ) and
    feasibility must still coincide."""
    st, ell = state_pair
    lb, ub = st.degree_bounds()
    for Z in (max(2, lb), ub, ub + 4):
        zd, ZZd, remd = dense_cls.run(Z, st)
        ze, ZZe, reme = ell_cls.run(Z, ell)
        assert remd == reme, (Z, remd, reme)
        assert ZZd == ZZe, (Z, ZZd, ZZe)
        if reme == 0:
            ok, ni, na = verify_assignment_ell(ell, ze)
            assert ok, (ni, na)


def test_incoming_gain_scores_match_dense(state_pair):
    st, ell = state_pair
    from sig_sdp_mmw_tpu.models.heuristics_ell import incoming_gain_scores

    eye = jnp.eye(st.Kp, dtype=bool)
    sd = np.asarray(jnp.sum(jnp.where(eye, 0.0, st.S).T, axis=1))[: st.K]
    se = np.asarray(incoming_gain_scores(ell))[: st.K]
    np.testing.assert_allclose(se, sd, rtol=2e-5, atol=1e-6)


def test_not_z_bound_matches_dense(state_pair):
    st, ell = state_pair
    zd, ZZd, remd = MAX_GAIN.run(0, st, not_Z_bound=True)
    ze, ZZe, reme = MAX_GAIN_ELL.run(0, ell, not_Z_bound=True)
    assert remd == reme == 0
    assert ZZd == ZZe


def test_max_rand_ell_feasible_at_large_Z(state_pair):
    st, ell = state_pair
    _, ub = st.degree_bounds()
    z, Z, rem = MAX_RAND_ELL.run(ub + 8, ell)
    if rem == 0:
        ok, ni, na = verify_assignment_ell(ell, z)
        assert ok, (ni, na)
    assert len(z) == st.K
