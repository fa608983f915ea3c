"""Numerical kernels vs scipy/numpy oracles (float64, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg

from sig_sdp_mmw_tpu.ops.expm import (
    default_lanczos_iters,
    lanczos_expm_multiply,
    taylor_expm_multiply,
)
from sig_sdp_mmw_tpu.ops.lanczos import lanczos_extreme_eigs
from sig_sdp_mmw_tpu.ops.rsvd import randomized_symmetric_lowrank


def random_sym(K, norm, seed, sparse_frac=0.9):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((K, K))
    A[rng.random((K, K)) < sparse_frac] = 0.0
    A = 0.5 * (A + A.T)
    ev = np.linalg.eigvalsh(A)
    return A * (norm / max(abs(ev[0]), abs(ev[-1])))


@pytest.mark.parametrize("norm", [1.0, 10.0, 40.0])
def test_lanczos_expm_matches_scipy(norm):
    K, D = 120, 16
    A = random_sym(K, norm, seed=int(norm))
    rng = np.random.default_rng(7)
    V = rng.standard_normal((K, D))
    want = scipy.sparse.linalg.expm_multiply(scipy.sparse.csr_matrix(A), V)

    Aj = jnp.asarray(A)
    m = default_lanczos_iters(norm)
    F, sigma = lanczos_expm_multiply(lambda X: Aj @ X, jnp.asarray(V), m=m)
    got = np.asarray(F) * np.exp(float(sigma))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6 * np.abs(want).max())


def test_lanczos_expm_scale_invariant_inner_products():
    """The MMW consumer only uses Gram products of the sketch; check they are
    consistent under the global log-scale at a norm where exp overflows f32."""
    K, D = 80, 8
    A = random_sym(K, 60.0, seed=3)
    rng = np.random.default_rng(0)
    V = rng.standard_normal((K, D))
    want = scipy.sparse.linalg.expm_multiply(scipy.sparse.csr_matrix(A), V)
    G_want = want @ want.T
    G_want /= np.trace(G_want)

    Aj = jnp.asarray(A)
    F, _ = lanczos_expm_multiply(lambda X: Aj @ X, jnp.asarray(V),
                                 m=default_lanczos_iters(60.0))
    F = np.asarray(F)
    G = F @ F.T
    G /= np.trace(G)
    np.testing.assert_allclose(G, G_want, atol=1e-8)


@pytest.mark.parametrize("norm", [1.0, 10.0, 40.0])
def test_lanczos_expm_taylor_ss_matches_scipy(norm):
    K, D = 120, 16
    A = random_sym(K, norm, seed=int(norm))
    rng = np.random.default_rng(7)
    V = rng.standard_normal((K, D))
    want = scipy.sparse.linalg.expm_multiply(scipy.sparse.csr_matrix(A), V)

    Aj = jnp.asarray(A)
    m = default_lanczos_iters(norm)
    F, sigma = lanczos_expm_multiply(lambda X: Aj @ X, jnp.asarray(V), m=m,
                                     small_method="taylor_ss", norm_bound=norm)
    got = np.asarray(F) * np.exp(float(sigma))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5 * np.abs(want).max())


def test_lanczos_expm_happy_breakdown():
    """A = c*I gives Krylov dimension 1; must not NaN."""
    K, D = 32, 4
    Aj = 2.5 * jnp.eye(K)
    V = jnp.asarray(np.random.default_rng(0).standard_normal((K, D)))
    F, sigma = lanczos_expm_multiply(lambda X: Aj @ X, V, m=12)
    got = np.asarray(F) * np.exp(float(sigma))
    np.testing.assert_allclose(got, np.exp(2.5) * np.asarray(V), rtol=1e-6)


def test_taylor_matches_lanczos_small_norm():
    K, D = 60, 6
    A = random_sym(K, 3.0, seed=11)
    Aj = jnp.asarray(A)
    V = jnp.asarray(np.random.default_rng(1).standard_normal((K, D)))
    F, sigma = lanczos_expm_multiply(lambda X: Aj @ X, V, m=32)
    T = taylor_expm_multiply(lambda X: Aj @ X, V, steps=4, order=12)
    np.testing.assert_allclose(np.asarray(F) * np.exp(float(sigma)),
                               np.asarray(T), rtol=1e-8)


def test_extreme_eigs():
    K = 200
    A = random_sym(K, 5.0, seed=5)
    lo, hi = lanczos_extreme_eigs(lambda X: jnp.asarray(A) @ X,
                                  jax.random.PRNGKey(0), K, m=48,
                                  dtype=jnp.float64)
    ev = np.linalg.eigvalsh(A)
    assert float(lo) == pytest.approx(ev[0], abs=1e-4)
    assert float(hi) == pytest.approx(ev[-1], abs=1e-4)


def test_randomized_lowrank_matches_svds():
    K, r = 150, 10
    rng = np.random.default_rng(2)
    U = np.linalg.qr(rng.standard_normal((K, r)))[0]
    s = np.linspace(5.0, 1.0, r)
    sign = np.where(rng.random(r) < 0.3, -1.0, 1.0)
    A = (U * (s * sign)) @ U.T

    Ug, sg = randomized_symmetric_lowrank(jnp.asarray(A), r, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.sort(np.asarray(sg))[::-1], s, rtol=1e-8)
    # Reconstruction through the factor (sign-less, like svds |s|).
    R = np.asarray(Ug) * np.asarray(sg)
    # Check subspace: projector onto span(U) equals projector onto span(Ug).
    P_want = U @ U.T
    P_got = np.asarray(Ug) @ np.asarray(Ug).T
    np.testing.assert_allclose(P_got, P_want, atol=1e-7)


def test_regular_simplex():
    from sig_sdp_mmw_tpu.ops.simplex import (
        generate_rand_regular_simplex_with_Z_vertices)

    Z, D = 6, 12
    V = generate_rand_regular_simplex_with_Z_vertices(
        Z, D, key=jax.random.PRNGKey(1), dtype=jnp.float64)
    G = np.asarray(V) @ np.asarray(V).T
    np.testing.assert_allclose(np.diag(G), 1.0, atol=1e-9)
    off = G[~np.eye(Z, dtype=bool)]
    np.testing.assert_allclose(off, -1.0 / (Z - 1), atol=1e-9)
