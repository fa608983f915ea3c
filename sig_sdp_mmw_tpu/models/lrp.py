"""LP relaxation baseline: assignment-probability matrix P in [0,1]^{Z x K}.

Parity with the reference ``lrp_solver`` (``sim_src/alg/lrp.py``), whose
constraint system (``lrp.py:41-51``) is

    0 <= P <= 1,   sum_z P_zk = 1,
    P_z,i + P_z,j <= 1            for associated pairs (i, j),
    (P S)_zk <= P_zk (h_max_k - S_sum_k) + S_sum_k      (big-M interference)

solved by cvxpy+SCS.  Here the polytope feasibility problem is solved by a
jitted projection method (alternating Cimmino-averaged projections onto the
four constraint families) — same role, same iteration-budget semantics, no C
solver dependency.  Rounding uses the reference's LP variant: natural user
order, slots preferred by decreasing probability (``lrp.py:57-125``).
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
from sig_sdp_mmw_tpu.models.rounding import _default_z_pad, _greedy_assign
from sig_sdp_mmw_tpu.utils.stats import StatsObject


@functools.partial(jax.jit, static_argnames=("nit", "Z_pad"))
def lrp_solve(state: SigState, Z, *, nit: int, Z_pad: int):
    Kp = state.Kp
    dtype = state.S.dtype
    Zf = jnp.asarray(Z, dtype)
    op = build_mmw_operands(state, Zf)

    mask = op.mask
    zrow = (jnp.arange(Z_pad) < Z)[:, None]                  # [Z_pad, 1]
    valid = zrow & mask[None, :]

    # S as used by the reference: dense(S̃)^T (lrp.py:43); (P S)_zk = sum_j P_zj S̃_kj.
    StT = op.St.T                                            # [Kp(j), Kp(k)]
    a_diag = op.S_sum - op.h_max                             # big-M coefficient
    # Row functional for constraint (z, k): sum_j P_zj S̃_kj + P_zk a_k <= S_sum_k.
    norm2 = jnp.maximum(jnp.sum(op.St * op.St, axis=1) + a_diag ** 2, 1e-12)

    asso = (state.Q != 0) & mask[:, None] & mask[None, :]

    def proj(P):
        # Box.
        P = jnp.clip(P, 0.0, 1.0)
        # Column sums to one over active slots (additive correction + box).
        colsum = jnp.sum(jnp.where(valid, P, 0.0), axis=0)
        P = P + jnp.where(valid, (1.0 - colsum)[None, :] / jnp.maximum(Zf, 1.0), 0.0)
        P = jnp.clip(P, 0.0, 1.0)
        # Association pairs: P_zi + P_zj <= 1 — exact per-pair halfspace
        # projections, Cimmino-averaged per user (``lrp.py:46``).  Each
        # violated pair's projection moves both endpoints by excess/2; user
        # i receives the convex combination over its deg_i pairs (averaged
        # projections are Fejer-monotone, so the POCS sweep converges).
        assoF = asso.astype(dtype)
        deg = jnp.maximum(jnp.sum(assoF, axis=1), 1.0)

        def pair_corr(Pz):
            E = jnp.maximum(Pz[:, None] + Pz[None, :] - 1.0, 0.0) * assoF
            return jnp.sum(E, axis=1) / (2.0 * deg)

        corr = lax.map(pair_corr, P)                         # [Z_pad, Kp]
        P = P - jnp.where(valid, corr, 0.0)
        P = jnp.clip(P, 0.0, 1.0)
        # Interference big-M rows: halfspace corrections, Cimmino-averaged.
        v = P @ StT + P * a_diag[None, :] - op.S_sum[None, :]  # [Z_pad, Kp]
        exc = jnp.maximum(v, 0.0) / norm2[None, :]
        # Gradient of the functional w.r.t. P row z: S̃_k. + a_k e_k.
        P = P - (exc @ op.St + exc * a_diag[None, :])
        P = jnp.clip(P, 0.0, 1.0)
        return jnp.where(valid, P, 0.0)

    P0 = jnp.where(valid, 1.0 / jnp.maximum(Zf, 1.0), 0.0)
    P = lax.fori_loop(0, nit, lambda i, P: proj(P), P0)
    return P


def lrp_residuals(state: SigState, P, Z) -> dict:
    """Feasibility residuals of P against the reference LP constraint system
    (``lrp.py:41-51``), max-norm per family.  Host-side diagnostic used by
    the residual tests (and by anyone validating the projection solver)."""
    P = np.asarray(P, np.float64)
    K = int(state.K)
    Zi = int(Z)
    Pa = P[:Zi, :K]

    box = max(float(np.max(-Pa, initial=0.0)),
              float(np.max(Pa - 1.0, initial=0.0)))
    colsum = float(np.max(np.abs(Pa.sum(axis=0) - 1.0)))

    Q = np.asarray(state.Q, np.float64)[:K, :K]
    ii, jj = np.nonzero(Q)
    pair = float(np.max(Pa[:, ii] + Pa[:, jj] - 1.0, initial=0.0))

    S = np.asarray(state.S, np.float64)[:K, :K].copy()
    np.fill_diagonal(S, 0.0)
    St = (S - S * (Q != 0)).T                 # S̃ rows as the LP uses them
    S_sum = St.sum(axis=1)
    h = np.asarray(state.h_max, np.float64)[:K]
    # (P S̃ᵀ)_zk <= P_zk (h_k - S_sum_k) + S_sum_k, relative to the row scale.
    lhs = Pa @ St.T
    rhs = Pa * (h - S_sum)[None, :] + S_sum[None, :]
    scale = np.maximum(np.abs(h - S_sum) + S_sum, 1e-12)
    interf = float(np.max((lhs - rhs) / scale[None, :], initial=0.0))
    return {"box": box, "colsum": colsum, "pair": pair, "interf": interf}


class LRPSolver(StatsObject):
    """Drop-in for the reference ``lrp_solver`` (``lrp.py:7``)."""

    def __init__(self, nit: int = 100, alpha: float = 1.0, seed: int = 0):
        self.nit = nit
        self.alpha = alpha
        self._key = jax.random.PRNGKey(seed)
        self._n = 0

    def run_with_state(self, bs_iteration: int, Z: int, state: SigState):
        ps_tic = self._get_tic()
        Z_pad = max(_default_z_pad(state), ((Z + 15) // 16) * 16)
        tim = self._get_tim(ps_tic)
        self._add_np_log("lrp_problem_setup", bs_iteration,
                         np.array([Z, state.K, tim]))

        tic = self._get_tic()
        P = lrp_solve(state, float(Z), nit=self.nit, Z_pad=Z_pad)
        tim = self._get_tim(tic, sync=P)
        self._add_np_log("lrp_solve", bs_iteration, np.array([Z, state.K, tim]))
        return True, P

    def rounding(self, Z: int, gX, state: SigState, nattempt: int = 1):
        """LP rounding (``lrp.py:57-125``): natural user order, slots by
        decreasing probability."""
        Z_pad = gX.shape[0]
        self._n += 1
        key = jax.random.fold_in(self._key, self._n)

        z_vec, rem = _lrp_round(state, jnp.asarray(gX), jnp.int32(Z), key,
                                Z_pad=Z_pad)
        return np.asarray(z_vec)[: state.K], Z, int(rem)


@functools.partial(jax.jit, static_argnames=("Z_pad",))
def _lrp_round(state: SigState, P, Z, key, Z_pad: int):
    Kp = state.Kp
    order = jnp.where(jnp.arange(Kp) < state.K, jnp.arange(Kp),
                      jnp.arange(Kp))          # natural order (lrp.py:76)
    slot_ok = (jnp.arange(Z_pad) < Z)[:, None]
    pref = jnp.argsort(jnp.argsort(-jnp.where(slot_ok, P, -jnp.inf), axis=0),
                       axis=0)
    slot_of, rem, assigned = _greedy_assign(state, order, pref, Z, Z_pad)
    fill = jax.random.randint(key, (Kp,), 0, jnp.maximum(Z, 1), jnp.int32)
    z_vec = jnp.where(assigned, slot_of, fill)
    z_vec = jnp.where(state.mask, z_vec, 0)
    return z_vec, rem
