"""Non-MMW relaxation baselines: random factor + spectral partitioning.

Parity with ``sim_src/alg/sdp_solver.py``:

* :class:`RandSDPSolver`     — row-normalized Gaussian factor (``:109-114``);
* :class:`SpectralSDPSolver` — top-Z Laplacian eigenvectors of the
  symmetrized gain graph, row-normalized (``:165-185``), with ARPACK
  ``eigsh`` replaced by jittable subspace (orthogonal) iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sig_sdp_mmw_tpu.core.problem import SigState
from sig_sdp_mmw_tpu.models.base import SDPSolverBase
from sig_sdp_mmw_tpu.utils.stats import StatsObject


class RandSDPSolver(SDPSolverBase, StatsObject):
    def __init__(self, nit: int = 100, rank_radio: int = 2, alpha: float = 1.0,
                 seed: int = 0):
        SDPSolverBase.__init__(self, nit=nit, rank_radio=rank_radio, alpha=alpha)
        self._key = jax.random.PRNGKey(seed)
        self._n = 0

    def run_with_state(self, bs_iteration: int, Z: int, state: SigState):
        self._n += 1
        key = jax.random.fold_in(self._key, self._n)
        gX = jax.random.normal(key, (state.Kp, Z * self.rank_radio),
                               state.S.dtype)
        gX = jnp.where(state.mask[:, None], gX, 0.0)
        gX = gX / jnp.maximum(jnp.linalg.norm(gX, axis=1, keepdims=True), 1e-30)
        return True, gX


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _subspace_topk(A, key, k: int, iters: int = 30):
    """Top-k eigenvectors (largest magnitude) via orthogonal iteration."""
    n = A.shape[0]
    Q = jnp.linalg.qr(jax.random.normal(key, (n, k), A.dtype))[0]

    def body(_, Q):
        return jnp.linalg.qr(A @ Q)[0]

    Q = lax.fori_loop(0, iters, body, Q)
    # Rayleigh–Ritz for eigen-alignment.
    B = Q.T @ (A @ Q)
    w, V = jnp.linalg.eigh(0.5 * (B + B.T))
    order = jnp.argsort(-jnp.abs(w))
    return Q @ V[:, order], w[order]


class SpectralSDPSolver(SDPSolverBase, StatsObject):
    def __init__(self, nit: int = 100, rank_radio: int = 2, alpha: float = 1.0,
                 seed: int = 0):
        SDPSolverBase.__init__(self, nit=nit, rank_radio=rank_radio, alpha=alpha)
        self._key = jax.random.PRNGKey(seed)

    def run_with_state(self, bs_iteration: int, Z: int, state: SigState):
        ps_tic = self._get_tic()
        Kp = state.Kp
        eye = jnp.eye(Kp, dtype=bool)
        Ssym = jnp.where(eye, 0.0, state.S + state.S.T)
        deg = jnp.sum(Ssym, axis=1)
        Lap = jnp.diag(deg) - Ssym
        tim = self._get_tim(ps_tic, sync=Lap)
        self._add_np_log("spectral_problem_setup", bs_iteration,
                         np.array([Z, state.K, tim]))

        tic = self._get_tic()
        vecs, _ = _subspace_topk(Lap, self._key, k=int(Z))
        gX = vecs / jnp.maximum(jnp.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        gX = jnp.where(state.mask[:, None], gX, 0.0)
        tim = self._get_tim(tic, sync=gX)
        self._add_np_log("spectral_solve", bs_iteration,
                         np.array([Z, state.K, tim]))
        return True, gX
