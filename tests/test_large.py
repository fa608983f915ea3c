"""Large-scale sparse generator: must match the reference-semantics dense
generator at overlapping scales, and scale to 10^4+ users on the host."""

import numpy as np
import jax.numpy as jnp
import pytest

from sig_sdp_mmw_tpu.env.env import EnvParams, WirelessEnv
from sig_sdp_mmw_tpu.env.large import generate_large_state_csr, interference_cutoff_m


def test_cutoff_is_conservative():
    p = EnvParams(cell_size=10, sta_density_per_1m2=75e-4)
    assert interference_cutoff_m(p) > p.cell_edge  # at least one cell ring


def test_matches_dense_generator_distributionally():
    """Same physics: at the same size, graph statistics must agree closely
    with the dense-path generator (different RNG streams, so compare
    distributions, not matrices)."""
    cell, rho = 8, 75e-4
    S, Q, h = generate_large_state_csr(cell, rho, seed=0)
    e = WirelessEnv(cell_size=cell, sta_density_per_1m2=rho, seed=0)
    st = e.generate_state()
    K = st.K
    assert S.shape[0] == K

    Sd = np.asarray(st.S)[:K, :K]
    deg_sparse = np.diff(S.indptr)
    deg_dense = (Sd != 0).sum(axis=1)
    assert abs(deg_sparse.mean() - deg_dense.mean()) < 0.15 * deg_dense.mean()

    hd = np.asarray(st.h_max)[:K]
    assert abs(np.median(h) - np.median(hd)) < 0.05 * abs(np.median(hd))

    nq_sparse = Q.nnz / K
    nq_dense = (np.asarray(st.Q)[:K, :K] != 0).sum() / K
    assert abs(nq_sparse - nq_dense) < 0.5 * max(nq_dense, 1)


def test_scales_to_10k_users():
    S, Q, h = generate_large_state_csr(60, 75e-4, seed=1)   # K = 10800
    K = S.shape[0]
    assert K == 10800
    assert S.nnz > 10 * K          # genuinely coupled graph
    assert S.nnz < 200 * K         # and genuinely sparse
    assert np.all(h > -1.0)
    # Diagonal present for every user (own-AP gain from power control).
    assert np.all(S.diagonal() > 0)


def test_ell_solver_runs_at_10k():
    import jax
    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.models.mmw_ell import mmw_solve_ell

    S, Q, h = generate_large_state_csr(60, 75e-4, seed=2)
    ell = ell_from_scipy(S, Q, h)
    out = jax.jit(lambda e, k: mmw_solve_ell(e, 24.0, nit=5, eta=0.05,
                                             D_pad=48, rank_pad=48, key=k,
                                             lanczos_m=8)
                  )(ell, jax.random.PRNGKey(0))
    assert np.isfinite(float(out.ub_final))


def test_verifiers_agree_and_catch_injected_violations_at_10k():
    """Property test on the independent checkers at scale (K=10800): the
    host-CSR and ELL verifiers must agree EXACTLY (feasible flag and both
    violation counts) on feasible, random, and deliberately violated
    assignments — so the independent checker is itself checked."""
    import scipy.sparse

    from sig_sdp_mmw_tpu.core.ell import ell_from_scipy
    from sig_sdp_mmw_tpu.models import MAX_GAIN_ELL
    from sig_sdp_mmw_tpu.models.rounding_ell import (
        verify_assignment_csr, verify_assignment_ell)

    S, Q, h = generate_large_state_csr(60, 75e-4, seed=3)
    K = S.shape[0]
    ell = ell_from_scipy(S, Q, h)

    def both(z):
        rc = verify_assignment_csr(S, Q, h, z)
        re = verify_assignment_ell(ell, z)
        assert rc == re, (rc, re)
        return rc

    # 1. A feasible assignment is accepted by both.
    z, ZZ, rem = MAX_GAIN_ELL.run(0, ell, not_Z_bound=True)
    assert rem == 0
    ok, ni, na = both(z)
    assert ok and ni == 0 and na == 0

    # 2. Injected association violation: one associated pair, same slot.
    Qu = scipy.sparse.triu(Q, k=1).tocoo()
    i, j = int(Qu.row[0]), int(Qu.col[0])
    z2 = np.array(z, np.int64)
    z2[j] = z2[i]
    ok, ni, na = both(z2)
    assert not ok and na >= 1

    # 3. Everyone in one slot: massive interference + association carnage.
    ok, ni, na = both(np.zeros(K, np.int64))
    assert not ok and ni > K // 4 and na > 0

    # 4. Random assignments at several slot counts: exact agreement.
    rng = np.random.default_rng(0)
    for Z in (4, 16, 64):
        both(rng.integers(0, Z, size=K))


def test_tail_margin_tightens_budgets():
    """tail_margin_z folds the expected sub-threshold interference into
    h_max: budgets shrink, never below the 10% floor, and shrink MORE at
    smaller Z_est (margin ~ 1/Z_est)."""
    base = generate_large_state_csr(12, 75e-4, seed=5)[2]
    h8 = generate_large_state_csr(12, 75e-4, seed=5, tail_margin_z=8)[2]
    h4 = generate_large_state_csr(12, 75e-4, seed=5, tail_margin_z=4)[2]
    assert (h8 <= base + 1e-12).all() and (h8 >= 0.1 * base - 1e-12).all()
    assert (h4 <= h8 + 1e-12).all()
    assert (h8 < base - 1e-9).any()          # margin actually applied
