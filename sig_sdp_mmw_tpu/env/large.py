"""Large-scale scenario generation: sparse state without densification.

The reference generator computes a dense [K, A] channel matrix
(``env.py:144-155``) — infeasible at the north-star scale (100k-1M links,
BASELINE.json configs 4-5).  This generator exploits what makes the state
sparse in the first place: thresholding at ``min_s_n_ratio`` (``env.py:151``)
implies a finite interference radius, so each user only interacts with APs
inside a computable cutoff.  A KD-tree neighbor query then builds the CSR
channel directly with O(K * deg) work and memory, and the state follows the
exact reference semantics (argmax association, S = rxpr[:, asso],
h_max = diag/min_sinr - 1; ``env.py:168-196``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from sig_sdp_mmw_tpu.env.env import EnvParams
from sig_sdp_mmw_tpu.env import phy


def interference_cutoff_m(p: EnvParams) -> float:
    """Distance beyond which a power-controlled user's rx ratio at any AP is
    below ``min_s_n_ratio`` even for the worst in-cell own-AP distance."""
    # Own-AP distance is at most half the cell diagonal.
    d_own = p.cell_edge * math.sqrt(2.0) / 2.0
    margin_db = 10.0 * math.log10(p.min_sinr * p.txp_offset / p.min_s_n_ratio)
    # loss(d) - loss(d_own) = 28 log10((d+1)/(d_own+1)) (env.py:93-97)
    return (d_own + 1.0) * 10.0 ** (margin_db / 28.0) - 1.0


def generate_large_state_csr(cell_size: int, sta_density_per_1m2: float = 75e-4,
                             seed: int = 0, params: Optional[EnvParams] = None,
                             return_locs: bool = False, backend: str = "auto"):
    """(S_csr, Q_csr, h_max[, sta_locs]) for a cell_size^2-AP grid at any
    scale.  Users are relabeled in spatial (grid-cell) order so the
    interference graph is banded — block-sparse friendly
    (:mod:`sig_sdp_mmw_tpu.ops.bcsr`); a pure relabeling, solution-invariant.

    ``backend``: ``"native"`` = the multithreaded C++ builder
    (csrc/sig_native.cpp), ``"python"`` = this module's scipy path,
    ``"auto"`` = native when buildable AND the instance is large enough to
    benefit (the vectorized scipy path wins below ~30k links; the threaded
    native builder wins ~2x above), else python.  Both produce the same
    state (tests/test_native.py pins pattern-exact agreement).
    """
    import scipy.sparse
    from scipy.spatial import cKDTree

    p = params or EnvParams(cell_size=cell_size,
                            sta_density_per_1m2=sta_density_per_1m2)
    if params is not None:
        p = params
    rng = np.random.default_rng(seed)
    K, A = p.n_sta, p.n_ap

    offset = p.cell_edge / 2.0
    x = np.linspace(offset, p.grid_edge - offset, p.cell_size)
    xx, yy = np.meshgrid(x, x)
    aps = np.stack([xx.ravel(), yy.ravel()], axis=1)
    stas = rng.uniform(0.0, p.grid_edge, size=(K, 2))
    from sig_sdp_mmw_tpu.ops.bcsr import spatial_order

    stas = stas[spatial_order(stas, p.cell_edge)]

    cutoff = interference_cutoff_m(p)

    _NATIVE_MIN_K = 30_000  # measured crossover vs the scipy path
    if backend == "native" or (backend == "auto" and K >= _NATIVE_MIN_K):
        from sig_sdp_mmw_tpu import native
        if native.native_available():
            S, Q, h_max, _asso = native.build_state_csr_native(stas, p, cutoff)
            if return_locs:
                return S, Q, h_max, stas
            return S, Q, h_max
        if backend == "native":
            raise RuntimeError("native builder requested but unavailable")
    tree = cKDTree(aps)
    pairs = tree.query_ball_point(stas, r=cutoff)

    rows = np.concatenate([np.full(len(nb), k) for k, nb in enumerate(pairs)])
    cols = np.concatenate([np.asarray(nb, dtype=np.int64) for nb in pairs])
    dis = np.linalg.norm(stas[rows] - aps[cols], axis=1)

    loss_db = (20.0 * math.log10(p.fre_Hz / 1e6) + 16.0 - 28.0
               + 28.0 * np.log10(dis + 1.0))
    gain = -loss_db
    # Power control to the strongest AP (env.py:136-142).
    gmax = np.full(K, -np.inf)
    np.maximum.at(gmax, rows, gain)
    noise = phy.noise_dbm(p.bandwidth)
    txp = (p.min_sinr_db - (gmax - noise)
           + 10.0 * math.log10(p.txp_offset))            # [K]
    rxpr_db = txp[rows] - loss_db - noise
    rxpr = 10.0 ** (rxpr_db / 10.0)
    keep = rxpr >= p.min_s_n_ratio
    rows, cols, rxpr = rows[keep], cols[keep], rxpr[keep]

    R = scipy.sparse.csr_matrix((rxpr, (rows, cols)), shape=(K, A))

    # Association by argmax over each user's neighborhood (env.py:177).
    asso = np.zeros(K, dtype=np.int64)
    best = np.full(K, -np.inf)
    np.maximum.at(best, rows, rxpr)
    # Find, per user, a column achieving the max (first occurrence).
    is_best = rxpr >= best[rows] - 0.0
    # first occurrence in CSR order:
    seen = np.zeros(K, dtype=bool)
    for_r = rows[is_best]
    for_c = cols[is_best]
    order = np.argsort(for_r, kind="stable")
    for_r, for_c = for_r[order], for_c[order]
    firsts = np.searchsorted(for_r, np.arange(K), side="left")
    asso = for_c[np.minimum(firsts, for_c.size - 1)]

    S = R[:, asso].tocsr()
    S.eliminate_zeros()
    S.sort_indices()

    # Association cliques (env.py:182-190).
    order = np.argsort(asso, kind="stable")
    sorted_asso = asso[order]
    qi, qj = [], []
    start = 0
    for a_end in np.flatnonzero(np.diff(sorted_asso)).tolist() + [K - 1]:
        group = order[start:a_end + 1]
        start = a_end + 1
        g = np.asarray(group)
        if g.size > 1:
            ii, jj = np.meshgrid(g, g)
            m = ii != jj
            qi.append(ii[m])
            qj.append(jj[m])
    if qi:
        qi = np.concatenate(qi)
        qj = np.concatenate(qj)
    else:
        qi = np.zeros(0, np.int64)
        qj = np.zeros(0, np.int64)
    Q = scipy.sparse.csr_matrix((np.ones(qi.size), (qi, qj)), shape=(K, K))

    h_max = np.asarray(S.diagonal()).ravel() / p.min_sinr - 1.0
    if return_locs:
        return S, Q, h_max, stas
    return S, Q, h_max
