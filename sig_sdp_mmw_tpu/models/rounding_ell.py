"""Sparse (ELL) randomized rounding + feasibility checker — the large-K path.

The dense rounding (:mod:`sig_sdp_mmw_tpu.models.rounding`) materializes
``S`` as ``[Kp, Kp]``; at the north-star scale (100k-1M links) that is tens
of GB.  This module re-derives the reference greedy rounding
(``sim_src/alg/sdp_solver.py:27-107``) on the static ELL state: the per-user
slot scan only ever touches the user's padded neighbor rows, so one greedy
step is O(Z_pad * deg) gathers and the whole attempt is O(K * Z_pad * deg).

Exact-trajectory argument (why S̃ = S-minus-assoc-minus-diag suffices even
though the reference checks against S-minus-diag, ``sdp_solver.py:30-34``):
the only S entries the two differ on are association pairs (i, j).  A user's
interference check reads ``gain_sum`` only at positions of *same-slot
assigned* S-neighbors and at itself; an association neighbor of any user k
can never be assigned to a slot k occupies (the association check at
``sdp_solver.py:87-92`` forbids it first), so an assoc-pair gain in
``gain_sum`` could only ever be read during a probe of a slot that the
association check rejects anyway — every slot accept/reject decision, and
hence the full greedy trajectory, is identical.  The independent checker
:func:`verify_assignment_ell` nevertheless accounts assoc-pair gains exactly
(via ``EllState.q_gain``) so its violation *counts* match the dense
:func:`sig_sdp_mmw_tpu.models.rounding.verify_assignment` bit-for-bit.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sig_sdp_mmw_tpu.core.ell import EllState


def _greedy_assign_ell(ell: EllState, order, pref, Z, Z_pad: int):
    """Greedy user-major assignment on the ELL state.

    Args:
      order: [Kp] user visit order (padded users last).
      pref:  [Z_pad, Kp] slot preference rank per user (0 = most preferred).
      Z: traced int32 — number of usable slots.

    Returns: (slot_of [Kp] int32 (-1 = unassigned), remainder, assigned mask).
    """
    Kp = ell.Kp
    dtype = ell.s_vals.dtype
    zs = jnp.arange(Z_pad, dtype=jnp.int32)
    slot_ok = zs < Z

    def user_step(kk, carry):
        slot_of, load = carry
        k = order[kk]
        valid_user = ell.mask[k]

        scols = ell.st_cols[k]                    # [degS] S row (no assoc/diag)
        svals = ell.st_vals[k]
        nbr_ok = svals != 0.0
        qcols = ell.q_cols[k]                     # [degQ] association neighbors
        qmask = ell.q_mask[k]

        nslot = slot_of[scols]                    # [degS] neighbor slots
        # Interference check at assigned same-slot S-neighbors
        # (sdp_solver.py:79-84): would adding k push neighbor j over budget?
        nload = load[:, scols]                    # [Z_pad, degS]
        vio_nbr = (nload + svals[None, :] > ell.h_max[scols][None, :])
        chk_nbr = nbr_ok[None, :] & (nslot[None, :] == zs[:, None])
        badH = jnp.any(chk_nbr & vio_nbr, axis=1)           # [Z_pad]
        # Self check: accumulated load at k's own AP (tmp_h[k] = 0 after
        # setdiag(0), so the self term is load alone).
        badSelf = load[:, k] > ell.h_max[k]                  # [Z_pad]
        # Association check (sdp_solver.py:87-92): no associated neighbor in
        # the candidate slot.
        qslot = slot_of[qcols]                    # [degQ]
        badA = jnp.any(qmask[None, :] & (qslot[None, :] == zs[:, None]), axis=1)

        feas = ~badH & ~badSelf & ~badA & slot_ok & valid_user
        cost = jnp.where(feas, pref[:, k], jnp.iinfo(jnp.int32).max)
        z_best = jnp.argmin(cost)
        got = feas[z_best]

        slot_of = slot_of.at[k].set(
            jnp.where(got, z_best.astype(jnp.int32), jnp.int32(-1)))
        # Accumulate k's interference row into the chosen slot's load
        # (padding slots carry svals == 0, so the scatter is mask-free).
        add = jnp.where(got, svals, jnp.zeros_like(svals)).astype(dtype)
        load = load.at[z_best, scols].add(add, mode="drop")
        return slot_of, load

    slot_of0 = jnp.full((Kp,), -1, jnp.int32)
    load0 = jnp.zeros((Z_pad, Kp), dtype)
    slot_of, _ = lax.fori_loop(0, ell.K, user_step, (slot_of0, load0))

    assigned = slot_of >= 0
    remainder = jnp.sum((~assigned) & ell.mask)
    return slot_of, remainder, assigned


def _one_attempt_ell(ell: EllState, gX, randv, Z, Z_pad: int):
    """One rounding attempt: the reference's ordering + preference recipe
    (``sdp_solver.py:48-57``) on the ELL state."""
    norms = jnp.linalg.norm(gX, axis=1)
    order = jnp.argsort(-jnp.where(ell.mask, norms, -jnp.inf))
    inprod = randv @ gX.T                         # [Z_pad, Kp]
    slot_ok = (jnp.arange(Z_pad) < Z)[:, None]
    pref = jnp.argsort(jnp.argsort(-jnp.where(slot_ok, inprod, -jnp.inf),
                                   axis=0), axis=0)
    return _greedy_assign_ell(ell, order, pref, Z, Z_pad)


@functools.partial(jax.jit, static_argnames=("Z_pad", "nattempt"))
def _rounding_batch_ell(ell: EllState, gX, Z, key, Z_pad: int, nattempt: int):
    Kp = ell.Kp
    D = gX.shape[1]

    def attempt(akey):
        rv = jax.random.normal(akey, (Z_pad, D), ell.s_vals.dtype)
        active = jnp.any(gX != 0.0, axis=0)[None, :]
        rv = jnp.where(active, rv, 0.0)
        rn = jnp.linalg.norm(rv, axis=1, keepdims=True)
        rv = jnp.where(rn > 0, rv / jnp.where(rn > 0, rn, 1.0), 0.0)
        return _one_attempt_ell(ell, gX, rv, Z, Z_pad)

    keys = jax.random.split(key, nattempt)
    slots, rems, assigned = jax.vmap(attempt)(keys)

    ok = rems == 0
    first_ok = jnp.argmax(ok)
    pick = jnp.where(jnp.any(ok), first_ok, nattempt - 1)
    slot_of = slots[pick]
    rem = rems[pick]
    asn = assigned[pick]

    # Random fallback for unassigned users (sdp_solver.py:104-105).
    fkey = jax.random.fold_in(key, 99)
    fill = jax.random.randint(fkey, (Kp,), 0, jnp.maximum(Z, 1), jnp.int32)
    z_vec = jnp.where(asn, slot_of, fill)
    z_vec = jnp.where(ell.mask, z_vec, 0)
    return z_vec, rem


def default_z_pad_ell(ell: EllState, Z: int = None) -> int:
    """Static slot-axis padding.  With ``Z`` given, bucket to the smallest
    power of two >= max(Z, 16): every [Z_pad, Kp] rounding buffer (and the
    per-user slot scan) then scales with the probe's own Z instead of the
    search window's upper bound — at K~100k with ub~108 the late (small-Z)
    probes shrink ~4x.  Power-of-two bucketing keeps the executable count
    logarithmic over a binary search; slots >= Z are masked (`slot_ok`), so
    a smaller Z inside a wider pad remains a VALID randomized attempt.
    (Note the trajectory is not bit-identical across pads: threefry derives
    each element's bits from the full draw shape, so ``normal(key, (Z_pad,
    D))`` yields different vectors per Z_pad bucket — masking guarantees
    correctness, not cross-bucket reproducibility.)"""
    if Z is not None:
        return 1 << (max(int(Z), 16) - 1).bit_length()
    _, ub = ell.degree_bounds()
    return ((ub + 15) // 16) * 16


@functools.partial(jax.jit, static_argnames=("Z_pad",))
def _rounding_single_ell(ell: EllState, gX, Z, key, Z_pad: int):
    """One attempt + random fallback — the sequential-retry building block."""
    rv = jax.random.normal(key, (Z_pad, gX.shape[1]), ell.s_vals.dtype)
    active = jnp.any(gX != 0.0, axis=0)[None, :]
    rv = jnp.where(active, rv, 0.0)
    rn = jnp.linalg.norm(rv, axis=1, keepdims=True)
    rv = jnp.where(rn > 0, rv / jnp.where(rn > 0, rn, 1.0), 0.0)
    slot_of, rem, asn = _one_attempt_ell(ell, gX, rv, Z, Z_pad)
    fkey = jax.random.fold_in(key, 99)
    fill = jax.random.randint(fkey, (ell.Kp,), 0, jnp.maximum(Z, 1), jnp.int32)
    z_vec = jnp.where(asn, slot_of, fill)
    z_vec = jnp.where(ell.mask, z_vec, 0)
    return z_vec, rem


# Row-count cap for batching all attempts into one vmapped device program.
# Batching trades the reference's first-success early exit
# (sdp_solver.py:18-25) for one device program whose sequential user scan is
# shared by all attempts — a clear win at small K.  The default cap is an
# ENVIRONMENT capability, not a law: this image's tunneled TPU worker kills
# executions above a per-execution WORK ceiling (rows x attempts — NOT
# bytes, NOT wall time alone).  Measured boundary in
# BATCH_ROUNDING_PROBE.json (tools/probe_batched_rounding.py, subprocess-
# isolated): 33k rows x 10 attempts ok (97 s), 66k x 10 crashes the
# worker, 66k x 2 ok (80 s).  The same ceiling caps solver iterations per
# execution at 1M links (tools/million_link.py --segment).  On directly-
# attached hardware raise SIG_SDP_BATCH_ROUNDING_MAX_KP to taste; at large
# K the sequential loop's first-success early exit is usually the better
# semantics anyway (feasible probes succeed on attempt 1).
_BATCH_ATTEMPT_MAX_KP = int(os.environ.get("SIG_SDP_BATCH_ROUNDING_MAX_KP",
                                           16384))


def rounding_ell(Z: int, gX, ell: EllState, key, nattempt: int = 10,
                 Z_pad: int = None, batch_attempts: bool = None
                 ) -> Tuple[np.ndarray, int, int]:
    """Reference-compatible entry (``sdp_solver.py:18``) on the ELL state.

    ``batch_attempts``: run all ``nattempt`` attempts as one vmapped device
    program (one shared user scan) vs. a host retry loop with first-success
    exit (the reference's own control flow; the memory-lean 1M-link default).
    """
    if Z_pad is None:
        Z_pad = default_z_pad_ell(ell, Z)
    if batch_attempts is None:
        batch_attempts = ell.Kp <= _BATCH_ATTEMPT_MAX_KP
    gX = jnp.asarray(gX)
    if batch_attempts:
        z_vec, rem = _rounding_batch_ell(ell, gX, jnp.int32(Z), key,
                                         Z_pad=Z_pad, nattempt=nattempt)
        return np.asarray(z_vec)[: ell.K], Z, int(rem)

    for a in range(nattempt):
        akey = jax.random.fold_in(key, a)
        z_vec, rem = _rounding_single_ell(ell, gX, jnp.int32(Z), akey,
                                          Z_pad=Z_pad)
        rem = int(rem)
        if rem == 0:
            break
    return np.asarray(z_vec)[: ell.K], Z, rem


def verify_assignment_csr(S_csr, Q_csr, h_max, z_vec) -> Tuple[bool, int, int]:
    """Independent O(nnz) feasibility checker on the host CSR state.

    Same semantics as :func:`verify_assignment_ell` /
    :func:`sig_sdp_mmw_tpu.models.rounding.verify_assignment` (interference
    load at user j = sum of same-slot S[k, j] over k != j vs ``h_max[j]``;
    association violation = same-slot associated pair), but consuming the
    scipy matrices directly — no device arrays touched, so it is the right
    verifier when the solver state lives on a remote/tunneled device.
    """
    S = S_csr.tocoo()
    z = np.asarray(z_vec).astype(np.int64)
    K = S.shape[0]
    h = np.asarray(h_max, np.float64)

    offd = S.row != S.col
    same = offd & (z[S.row] == z[S.col])
    load = np.zeros(K, np.float64)
    np.add.at(load, S.col[same], S.data[same].astype(np.float64))
    n_interf = int(np.sum(load > h))

    # Count association violations on the upper triangle of the symmetrized
    # pattern, so a Q that stores only one triangle still counts each
    # violated pair exactly once.
    Qc = Q_csr.tocoo()
    qoff = (Qc.row != Qc.col) & (Qc.data != 0)
    lo = np.minimum(Qc.row[qoff], Qc.col[qoff]).astype(np.int64)
    hi = np.maximum(Qc.row[qoff], Qc.col[qoff]).astype(np.int64)
    pairs = np.unique(lo * K + hi)
    n_asso = int(np.sum(z[pairs // K] == z[pairs % K]))
    return (n_interf == 0 and n_asso == 0), n_interf, n_asso


def verify_assignment_ell(ell: EllState, z_vec) -> Tuple[bool, int, int]:
    """Independent O(nnz) feasibility checker on the ELL state (host numpy).

    Semantics identical to the dense
    :func:`sig_sdp_mmw_tpu.models.rounding.verify_assignment`: interference
    load at user j = sum of same-slot S[k, j] over k != j (S̃ rows plus the
    assoc-pair gains from ``q_gain``), compared against ``h_max``; an
    association violation is a same-slot associated pair.
    """
    K = ell.K
    Kp = ell.Kp
    z = np.full(Kp, -1, np.int64)
    z[:K] = np.asarray(z_vec)[:K]
    mask = np.asarray(ell.mask)
    h = np.asarray(ell.h_max, np.float64)

    load = np.zeros(Kp, np.float64)
    # S̃ rows: st row k holds S[k, j] for non-assoc, non-diag neighbors j.
    st_cols = np.asarray(ell.st_cols)
    st_vals = np.asarray(ell.st_vals, np.float64)
    rows = np.repeat(np.arange(Kp), st_cols.shape[1]).reshape(st_cols.shape)
    same = (z[rows] == z[st_cols]) & (st_vals != 0) & mask[rows]
    np.add.at(load, st_cols[same], st_vals[same])
    # Assoc-pair gains (stripped from S̃ but present in the reference's S).
    q_cols = np.asarray(ell.q_cols)
    q_gain = np.asarray(ell.q_gain, np.float64)
    q_mask = np.asarray(ell.q_mask)
    rowsq = np.repeat(np.arange(Kp), q_cols.shape[1]).reshape(q_cols.shape)
    sameq = (z[rowsq] == z[q_cols]) & q_mask & mask[rowsq]
    np.add.at(load, q_cols[sameq], q_gain[sameq])

    n_interf = int(np.sum((load > h) & mask))

    a_i = np.asarray(ell.a_i)
    a_j = np.asarray(ell.a_j)
    a_mask = np.asarray(ell.a_mask)
    n_asso = int(np.sum(a_mask & (z[a_i] == z[a_j])))
    return (n_interf == 0 and n_asso == 0), n_interf, n_asso
