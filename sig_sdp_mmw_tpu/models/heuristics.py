"""Greedy scheduling heuristics (comparison baselines).

Parity with the reference ``sim_src/alg/gm.py``:

* :class:`MAX_GAIN`  — slot-major greedy packing, users ranked by total
  incoming gain (``gm.py:6-66``);
* :class:`MAX_ASSO`  — same, ranked by association degree (``gm.py:69-129``);
* :class:`MAX_RAND`  — user-major greedy with random user order and random
  slot preferences but the same feasibility checks (``gm.py:131-200``);
* ``not_Z_bound=True`` grows the number of slots until everyone fits
  (``gm.py:22-23``).

All inner loops are jitted; the slot-major pack keeps only the *current*
slot's accumulators (two [Kp] vectors), so a slot step is pure VPU work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sig_sdp_mmw_tpu.core.problem import SigState
from sig_sdp_mmw_tpu.models.rounding import _default_z_pad
from sig_sdp_mmw_tpu.utils.stats import StatsObject


@functools.partial(jax.jit, static_argnames=("Z_pad", "nattempt"))
def _greedy_pack_slot_major(state: SigState, scores, Z, key, Z_pad: int,
                            nattempt: int = 1):
    """Slot-by-slot packing: for each slot, scan users in decreasing score
    order and add each one that passes the interference + association checks
    against the slot's current members (``gm.py:24-58``).

    ``nattempt``: per-slot retry loop keeping the longest packing
    (``gm.py:29-53``).  Faithful to the reference, where the rank is
    deterministic, so every attempt coincides — the knob exists for parity
    and for score functions that may one day be stochastic."""
    Kp = state.Kp
    dtype = state.S.dtype
    eye = jnp.eye(Kp, dtype=bool)
    S = jnp.where(eye, 0.0, state.S)
    Q = state.Q
    h_max = state.h_max
    mask = state.mask

    order = jnp.argsort(-jnp.where(mask, scores, -jnp.inf))

    def slot_step(z, slot_of):
        active_slot = z < Z

        def user_step(kk, c):
            gain_sum, asso_sum, slot_of = c
            k = order[kk]
            eligible = (slot_of[k] < 0) & mask[k] & active_slot
            member = (slot_of == z)
            chk = member | eye[k]
            okH = ~jnp.any(chk & (gain_sum + S[k] > h_max))
            okA = ~jnp.any(chk & (asso_sum + Q[k] >= 1.0))
            take = eligible & okH & okA
            gain_sum = gain_sum + jnp.where(take, S[k], 0.0)
            asso_sum = asso_sum + jnp.where(take, Q[k], 0.0)
            slot_of = slot_of.at[k].set(jnp.where(take, jnp.int32(z), slot_of[k]))
            return gain_sum, asso_sum, slot_of

        def one_attempt(slot_of_in):
            _, _, out = lax.fori_loop(
                0, state.K, user_step,
                (jnp.zeros((Kp,), dtype), jnp.zeros((Kp,), dtype), slot_of_in))
            return out

        if nattempt == 1:
            return one_attempt(slot_of)

        # gm.py:29-53: keep the attempt packing the most users into slot z
        # (strict >, so ties keep the earliest attempt).
        def attempt_step(n, best):
            best_slot_of, best_count = best
            cand = one_attempt(slot_of)
            count = jnp.sum((cand == z) & (slot_of != z), dtype=jnp.int32)
            better = count > best_count
            return (jnp.where(better, cand, best_slot_of),
                    jnp.maximum(count, best_count))

        best_slot_of, _ = lax.fori_loop(
            0, nattempt, attempt_step, (slot_of, jnp.int32(-1)))
        return best_slot_of

    slot_of = lax.fori_loop(0, Z_pad, slot_step, jnp.full((Kp,), -1, jnp.int32))

    assigned = slot_of >= 0
    rem = jnp.sum((~assigned) & mask)
    # Slots are processed in order, so when everyone fits the loop would have
    # broken right after the last-used slot (gm.py:57-58).
    ZZ = jnp.where(rem == 0, jnp.max(jnp.where(mask, slot_of, -1)) + 1, Z)
    fill = jax.random.randint(key, (Kp,), 0, jnp.maximum(ZZ, 1), jnp.int32)
    z_vec = jnp.where(assigned, slot_of, fill)
    z_vec = jnp.where(mask, z_vec, 0)
    return z_vec, ZZ, rem


@functools.partial(jax.jit, static_argnames=("Z_pad",))
def _greedy_user_major_random(state: SigState, Z, key, Z_pad: int):
    """MAX_RAND (``gm.py:131-200``): random user order + random slot
    preference, same per-user feasibility scan as the SDP rounding."""
    from sig_sdp_mmw_tpu.models.rounding import _one_attempt

    Kp = state.Kp
    k1, k2, k3 = jax.random.split(key, 3)
    # Random gX gives random rank; random randv gives random preferences.
    gX = jax.random.normal(k1, (Kp, 8), state.S.dtype)
    gX = jnp.where(state.mask[:, None], gX, 0.0)
    rv = jax.random.normal(k2, (Z_pad, 8), state.S.dtype)
    rv = rv / jnp.maximum(jnp.linalg.norm(rv, axis=1, keepdims=True), 1e-30)
    slot_of, rem, assigned = _one_attempt(state, gX, rv, Z, Z_pad)
    fill = jax.random.randint(k3, (Kp,), 0, jnp.maximum(Z, 1), jnp.int32)
    z_vec = jnp.where(assigned, slot_of, fill)
    z_vec = jnp.where(state.mask, z_vec, 0)
    return z_vec, rem


class _SlotMajorHeuristic(StatsObject):
    _seed = 777

    @classmethod
    def _scores(cls, state: SigState) -> jnp.ndarray:
        raise NotImplementedError

    @classmethod
    def run(cls, Z: int, state: SigState, nattempt: int = 1,
            not_Z_bound: bool = False) -> Tuple[np.ndarray, int, int]:
        if not_Z_bound:
            Z = state.K
        Z_pad = max(_default_z_pad(state), ((Z + 15) // 16) * 16)
        Z_pad = min(Z_pad, state.Kp)
        if Z > Z_pad:
            Z_pad = ((Z + 15) // 16) * 16
        key = jax.random.PRNGKey(cls._seed)
        z_vec, ZZ, rem = _greedy_pack_slot_major(
            state, cls._scores(state), jnp.int32(Z), key, Z_pad=Z_pad,
            nattempt=nattempt)
        return np.asarray(z_vec)[: state.K], int(ZZ), int(rem)


class MAX_GAIN(_SlotMajorHeuristic):
    """Rank by total incoming interference (``gm.py:18``: row sums of S^T
    with zero diagonal)."""

    @classmethod
    def _scores(cls, state: SigState):
        eye = jnp.eye(state.Kp, dtype=bool)
        St = jnp.where(eye, 0.0, state.S).T
        return jnp.sum(St, axis=1)


class MAX_ASSO(_SlotMajorHeuristic):
    """Rank by association degree (``gm.py:81``)."""

    @classmethod
    def _scores(cls, state: SigState):
        return jnp.sum(state.Q, axis=1)


class MAX_RAND(StatsObject):
    @classmethod
    def run(cls, Z: int, state: SigState, nattempt: int = 1
            ) -> Tuple[np.ndarray, int, int]:
        Z_pad = max(_default_z_pad(state), ((Z + 15) // 16) * 16)
        key = jax.random.PRNGKey(4242)
        z_vec, rem = _greedy_user_major_random(state, jnp.int32(Z), key,
                                               Z_pad=Z_pad)
        return np.asarray(z_vec)[: state.K], Z, int(rem)
