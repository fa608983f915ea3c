"""State preprocessing for the MMW solver (dense masked backend).

Re-derives, with static shapes and masks, what the reference's
``mmw._process_state`` (``sim_src/alg/mmw.py:26-41``) and pattern setup
(``mmw.py:52-60``) compute with mutable scipy CSR:

* ``St``        — S tilde: ``S^T`` with associated pairs and diagonal removed;
* ``S_sum``     — row sums of S tilde;
* ``norm_H``    — per-row constraint norms of the interference constraints;
* ``asso_ut``   — strict upper-triangular association pattern (the F
  constraints, one per associated pair);
* ``xpat``      — the off-diagonal sparsity pattern (S tilde symmetrized ∪ Q)
  on which the primal X is materialized (``mmw.py:187-194``);
* masks for padded users.

Everything is a pure jittable function of :class:`SigState` and a (possibly
traced) scalar ``Z``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sig_sdp_mmw_tpu.core.problem import SigState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MMWOperands:
    St: jax.Array        # [Kp,Kp] S tilde (S^T, no assoc, no diag)
    S_sum: jax.Array     # [Kp]
    norm_H: jax.Array    # [Kp] (safe: 1 where masked/zero)
    h_max: jax.Array     # [Kp]
    asso_ut: jax.Array   # [Kp,Kp] bool, strict upper triangle of Q pattern
    xpat: jax.Array      # [Kp,Kp] bool, off-diag X pattern (sym S̃ ∪ Q)
    mask: jax.Array      # [Kp] bool valid users
    K: int = dataclasses.field(metadata=dict(static=True))


def build_mmw_operands(state: SigState, Z) -> MMWOperands:
    Kp = state.Kp
    K = state.K
    m = state.mask
    m2 = m[:, None] & m[None, :]
    eye = jnp.eye(Kp, dtype=bool)

    Zf = jnp.asarray(Z, dtype=state.S.dtype)

    # S tilde: transpose, zero associated pairs + diagonal (mmw.py:28-33).
    asso = state.Q != 0
    St = jnp.where(m2 & ~asso & ~eye, state.S.T, 0.0)

    S_sum = jnp.sum(St, axis=1)

    # norm_H (mmw.py:36-39): sqrt(rowsum(St^2)) * (Z-1)/(2Z) + |h/K - S_sum/(KZ)|
    row2 = jnp.sum(St * St, axis=1)
    norm_H = (jnp.sqrt(row2) * (Zf - 1.0) / (2.0 * Zf)
              + jnp.abs(state.h_max / K - S_sum / (K * Zf)))
    # Padded rows get norm 1 so divisions stay finite; their constraints are
    # masked out of the softmax and losses.
    norm_H = jnp.where(m & (norm_H > 0), norm_H, 1.0)

    triu = jnp.triu(jnp.ones((Kp, Kp), dtype=bool), k=1)
    asso_ut = asso & triu & m2

    gain_sym = (St != 0) | (St.T != 0)
    xpat = (gain_sym | asso) & ~eye & m2

    return MMWOperands(St=St, S_sum=S_sum, norm_H=norm_H, h_max=state.h_max,
                       asso_ut=asso_ut, xpat=xpat, mask=m, K=K)
