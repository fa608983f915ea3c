"""Sparse BLER evaluator vs the dense reference-semantics evaluator on shared
geometry — the parity gate for the large-K evaluation path."""

import numpy as np
import jax.numpy as jnp
import pytest

from sig_sdp_mmw_tpu.env.env import (EnvParams, evaluate_sinr_from_rxpr,
                                     rxpr_unthresholded)
from sig_sdp_mmw_tpu.env.large import (LargeEnv, ap_grid,
                                       evaluate_sinr_sparse)


@pytest.fixture(scope="module")
def geometry():
    p = EnvParams(cell_size=8, sta_density_per_1m2=75e-4)
    rng = np.random.default_rng(5)
    stas = rng.uniform(0.0, p.grid_edge, size=(p.n_sta, 2))
    aps = ap_grid(p)
    return p, stas, aps


def test_sparse_eval_matches_dense(geometry):
    p, stas, aps = geometry
    K = stas.shape[0]
    rxpr = np.asarray(rxpr_unthresholded(jnp.asarray(stas), jnp.asarray(aps),
                                         p))
    rng = np.random.default_rng(7)
    for Z in (6, 12):
        z = rng.integers(0, Z, K)
        dense = np.asarray(evaluate_sinr_from_rxpr(jnp.asarray(rxpr),
                                                   jnp.asarray(z), p))
        sparse = evaluate_sinr_sparse(stas, aps, p, z, Z,
                                      eval_min_ratio=1e-4)
        # Same number of winner-rule losers (one winner per (AP, slot) group
        # is structural).  Per-user winner identity is NOT comparable: power
        # control equalizes own-AP signals, so co-scheduled co-associated
        # users have near-tied SINR and any truncation perturbation flips the
        # tie — a symmetric swap with no statistical effect.
        assert (dense == 1e-3).sum() == (sparse == 1e-3).sum()
        # The SINR multiset must match: sorted values close entrywise.
        ds = np.sort(dense)
        ss = np.sort(sparse)
        w = ds != 1e-3
        rel = np.abs(ss[w] - ds[w]) / ds[w]
        assert rel.max() < 0.05, rel.max()
        assert np.median(rel) < 0.01


def test_tail_correction_reduces_bias(geometry):
    """With aggressive truncation, the analytic mean-field tail must pull the
    interference estimate toward the dense truth."""
    p, stas, aps = geometry
    K = stas.shape[0]
    rxpr = np.asarray(rxpr_unthresholded(jnp.asarray(stas), jnp.asarray(aps),
                                         p))
    rng = np.random.default_rng(11)
    Z = 8
    z = rng.integers(0, Z, K)
    dense = np.asarray(evaluate_sinr_from_rxpr(jnp.asarray(rxpr),
                                               jnp.asarray(z), p))
    with_tail = evaluate_sinr_sparse(stas, aps, p, z, Z, eval_min_ratio=3e-2,
                                     tail_correction=True)
    without = evaluate_sinr_sparse(stas, aps, p, z, Z, eval_min_ratio=3e-2,
                                   tail_correction=False)
    # Compare the sorted SINR distributions (winner identity is tie-unstable,
    # see test_sparse_eval_matches_dense).
    w = np.sort(dense) != 1e-3
    ds = np.sort(dense)[w]
    err_with = np.abs(np.log(np.sort(with_tail)[w] / ds)).mean()
    err_without = np.abs(np.log(np.sort(without)[w] / ds)).mean()
    assert err_with < err_without


def test_large_env_end_to_end_small_scale():
    """LargeEnv: generate -> ELL -> BLER for a random assignment; finite,
    sane BLER values."""
    env = LargeEnv(cell_size=8, seed=3)
    S, Q, h = env.generate_state_csr()
    K = S.shape[0]
    rng = np.random.default_rng(0)
    Z = 16
    bler = env.evaluate_bler(rng.integers(0, Z, K), Z)
    assert bler.shape == (K,)
    assert np.all((bler >= 0.0) & (bler <= 1.0))
    # Some users collide at Z=16 in a dense scenario -> some high BLER;
    # most should be fine.
    assert np.median(bler) < 0.5
