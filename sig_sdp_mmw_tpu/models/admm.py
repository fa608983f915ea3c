"""Exact SDP baseline via ADMM splitting — the oracle role of cvxpy+SCS.

The reference's exact baseline (``sim_src/alg/sdp_solver.py:115-163``) hands
the feasibility SDP

    X >> 0,  diag(X) = 1,  X_ij <= -1/(Z-1) on associated pairs,
    sum_j S̃_kj X_kj (Z-1)/Z <= h_max_k - S_sum_k/Z

to the SCS interior C library.  cvxpy/SCS is not available in this image, so
the oracle is re-built TPU-native as a fully jitted ADMM consensus split

    minimize  I_PSD(X) + I_poly(Y)   s.t.  X = Y

with exact PSD projection (dense ``eigh``) and a polyhedral step that applies
the affine/inequality constraints: diagonal pinning, association clipping and
Cimmino-averaged halfspace corrections for the interference rows.  Like SCS
under ``max_iters=nit`` (``sdp_solver.py:127``), a finite iteration budget
yields an approximately feasible X; the downstream randomized rounding is
identical.  The final factor mirrors the reference's rank-trimmed SVD
(``sdp_solver.py:130-132``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sig_sdp_mmw_tpu.core.preprocess import build_mmw_operands
from sig_sdp_mmw_tpu.core.problem import SigState
from sig_sdp_mmw_tpu.models.base import SDPSolverBase
from sig_sdp_mmw_tpu.utils.stats import StatsObject

_PREC = lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("nit", "rank_pad"))
def admm_sdp_solve(state: SigState, Z, *, nit: int, rank_pad: int):
    Kp = state.Kp
    K = state.K
    dtype = state.S.dtype
    Zf = jnp.asarray(Z, dtype)
    op = build_mmw_operands(state, Zf)

    eye = jnp.eye(Kp, dtype=dtype)
    m2 = op.mask[:, None] & op.mask[None, :]
    asso = (state.Q != 0) & m2
    fbound = -1.0 / (Zf - 1.0)

    St = op.St
    St_norm2 = jnp.maximum(jnp.sum(St * St, axis=1), 1e-12)   # [Kp]
    c_H = (op.h_max - op.S_sum / Zf) * Zf / (Zf - 1.0)        # row budgets

    def proj_poly(X):
        # Diagonal pinning (const_D).
        X = jnp.where(jnp.eye(Kp, dtype=bool),
                      jnp.where(op.mask, 1.0, 0.0)[None, :] * eye, X)
        # Association cap (const_F), symmetric.
        X = jnp.where(asso, jnp.minimum(X, fbound), X)
        # Interference rows (const_H): Cimmino-averaged halfspace projections.
        v = jnp.sum(St * X, axis=1)                            # [Kp]
        excess = jnp.maximum(v - c_H, 0.0)
        corr = (excess / St_norm2)[:, None] * St               # [Kp, Kp]
        X = X - corr
        X = 0.5 * (X + X.T)
        X = jnp.where(m2, X, 0.0)
        return X

    def proj_psd(X):
        w, V = jnp.linalg.eigh(X)
        w = jnp.maximum(w, 0.0)
        return (V * w[None, :]) @ V.T

    def body(i, carry):
        Xv, Y, U = carry
        Xv = proj_psd(Y - U)
        Y = proj_poly(Xv + U)
        U = U + Xv - Y
        return Xv, Y, U

    X0 = jnp.where(jnp.eye(Kp, dtype=bool), 1.0, 0.0) * \
        jnp.where(op.mask, 1.0, 0.0)[None, :]
    Xv, Y, U = lax.fori_loop(0, nit, body,
                             (X0, X0, jnp.zeros((Kp, Kp), dtype)))

    X_final = 0.5 * (Xv + Y)
    # Rank-trimmed factor (sdp_solver.py:130-132) via eigh (X ~ PSD here).
    w, V = jnp.linalg.eigh(X_final)
    order = jnp.argsort(-jnp.abs(w))[:rank_pad]
    w_sel = jnp.abs(w[order])
    rank_act = jnp.minimum(jnp.asarray(K, jnp.int32),
                           ((Zf - 1.0) * 2).astype(jnp.int32))
    keep = (jnp.arange(rank_pad) < rank_act)[None, :]
    X_half = jnp.where(keep, V[:, order] * jnp.sqrt(w_sel)[None, :], 0.0)
    X_half = jnp.where(op.mask[:, None], X_half, 0.0)
    return X_half, X_final


class ADMMSDPSolver(SDPSolverBase, StatsObject):
    """Drop-in for the reference ``admm_sdp_solver`` (``sdp_solver.py:115``)."""

    def __init__(self, nit: int = 100, rank_radio: int = 2, alpha: float = 1.0):
        SDPSolverBase.__init__(self, nit=nit, rank_radio=rank_radio, alpha=alpha)

    def run_with_state(self, bs_iteration: int, Z: int, state: SigState):
        ps_tic = self._get_tic()
        _, ub = state.degree_bounds()
        rank_pad = min(((max(Z, ub) * self.rank_radio + 15) // 16) * 16,
                       state.Kp - 1)
        tim = self._get_tim(ps_tic)
        self._add_np_log("admm_problem_setup", bs_iteration,
                         np.array([Z, state.K, tim]))

        tic = self._get_tic()
        X_half, _ = admm_sdp_solve(state, float(Z), nit=self.nit,
                                   rank_pad=rank_pad)
        tim = self._get_tim(tic, sync=X_half)
        self._add_np_log("admm_solve", bs_iteration,
                         np.array([Z, state.K, tim]))
        return True, X_half
