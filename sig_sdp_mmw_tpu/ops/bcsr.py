"""Block-ELL sparse matmul — the MXU-native large-graph SpMM.

Arbitrary row gathers are the wrong primitive on TPU: Mosaic's dynamic
gather is tile-local and XLA's gather runs far below HBM bandwidth.  The
interference graph, however, is *spatially local* (users only hear APs
within a cutoff — :func:`sig_sdp_mmw_tpu.env.large.interference_cutoff_m`),
so after reordering users by grid cell the sparse matrix is banded.  We
store it as **block-ELL**: for each 128-row block, a padded list of nonempty
128x128 column blocks.  The SpMM is then a fori over block slots where each
step is a batched [128,128] x [128,D] matmul — pure MXU work, with gathers
only at whole-block granularity (contiguous, fast).

Memory trades FLOPs for bandwidth: blocks are stored dense (zeros included),
profitable whenever block fill is above ~1% (MXU speed / gather speed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockEll:
    bcols: jax.Array    # [Kb, maxblk] int32 — column-block indices
    blocks: jax.Array   # [Kb, maxblk, B, B] — dense block values
    nrows: int = dataclasses.field(metadata=dict(static=True))

    @property
    def B(self) -> int:
        return self.blocks.shape[-1]

    @property
    def Kb(self) -> int:
        return self.bcols.shape[0]


def _bcsr_arrays_np(M, block: int = 128, pad_rows_to: int = None,
                    dtype=np.float32):
    """Host-side BlockEll arrays (numpy) from a scipy CSR matrix."""
    M = M.tocsr()
    K = M.shape[0]
    Kp = pad_rows_to or ((K + block - 1) // block) * block
    Kb = Kp // block

    coo = M.tocoo()
    br = coo.row // block
    bc = coo.col // block
    blk_id = br * Kb + bc
    uniq, inv = np.unique(blk_id, return_inverse=True)
    ubr, ubc = uniq // Kb, uniq % Kb

    counts = np.bincount(ubr, minlength=Kb)
    maxblk = max(int(counts.max(initial=0)), 1)

    bcols = np.zeros((Kb, maxblk), np.int32)
    slot_of_uniq = np.zeros(uniq.size, np.int64)
    starts = np.zeros(Kb + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    order = np.argsort(ubr, kind="stable")
    slots = np.arange(uniq.size) - starts[ubr[order]]
    slot_of_uniq[order] = slots
    bcols[ubr[order], slots] = ubc[order]

    blocks = np.zeros((Kb, maxblk, block, block), dtype)
    slot_of_entry = slot_of_uniq[inv]
    blocks[br, slot_of_entry, coo.row % block, coo.col % block] = coo.data
    return bcols, blocks, Kp


def bcsr_from_csr(M, block: int = 128, pad_rows_to: int = None,
                  dtype=np.float32) -> BlockEll:
    """Convert a scipy CSR matrix to BlockEll."""
    bcols, blocks, Kp = _bcsr_arrays_np(M, block, pad_rows_to, dtype)
    return BlockEll(bcols=jnp.asarray(bcols), blocks=jnp.asarray(blocks),
                    nrows=Kp)


def bcsr_spmm(mat: BlockEll, V: jax.Array,
              precision=lax.Precision.HIGHEST) -> jax.Array:
    """BlockEll [Kp, Kp] x [Kp, D] -> [Kp, D]; all-MXU.

    Blocks may be stored in a narrower dtype (bfloat16) than V; the MXU
    multiplies in the block dtype and accumulates in V.dtype (float32) via
    ``preferred_element_type`` — the memory-lean large-graph mode."""
    B = mat.B
    Kb = mat.Kb
    D = V.shape[1]
    acc_dtype = V.dtype
    Vb = V.astype(mat.blocks.dtype).reshape(Kb, B, D)
    maxblk = mat.bcols.shape[1]

    def slot(s, acc):
        rhs = Vb[mat.bcols[:, s]]                  # block-granular gather
        return acc + lax.dot_general(
            mat.blocks[:, s], rhs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=precision, preferred_element_type=acc_dtype)

    out = lax.fori_loop(0, maxblk, slot, jnp.zeros((Kb, B, D), acc_dtype))
    return out.reshape(Kb * B, D)


def bcsr_pair_from_state(S_csr, Q_csr, block: int = 128
                         ) -> Tuple[BlockEll, BlockEll]:
    """(S tilde, S tilde^T) as BlockEll matrices for the MMW Lanczos matvec."""
    from sig_sdp_mmw_tpu.core.ell import build_st_csr

    St = build_st_csr(S_csr, Q_csr)
    K = St.shape[0]
    nr = ((K + block - 1) // block) * block
    StT = St.transpose().tocsr()
    return (bcsr_from_csr(St, block=block, pad_rows_to=nr),
            bcsr_from_csr(StT, block=block, pad_rows_to=nr))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BcsrOperands:
    """Everything the block-native MMW needs (see models/mmw_ell.py):

    * ``s_blocks`` / ``st_blocks`` — S tilde and its transpose as BlockEll.
      ``st_blocks`` may be ``None`` (memory-lean mode): the transpose matvec
      then runs through :func:`bcsr_spmm_transpose` on ``s_blocks``;
    * ``sw_vals`` — symmetrization weights on the s_blocks layout (1 one-way,
      0.5 bidirectional, 0 off-pattern) so undirected pattern edges count
      once in X-operator applies;
    * association-edge block layout: ``q_bcols`` plus flat scatter positions
      ``q_pos``/source ids ``q_eidx`` mapping the [E_pad] upper-tri edge
      value vector into a [Kb, maxblkQ, B, B] block array (both directions).
    """

    s_blocks: BlockEll
    st_blocks: Optional[BlockEll]
    sw_vals: jax.Array   # [Kb, maxblk, B, B]
    q_bcols: jax.Array   # [Kb, maxblkQ] int32
    q_pos: jax.Array     # [2E] int32 flat positions into the q block array
    q_eidx: jax.Array    # [2E] int32 indices into the ut edge value vector


def bcsr_operands_from_state(S_csr, Q_csr, E_pad: int = None,
                             block: int = 128, dtype=np.float32,
                             weights_dtype=None,
                             store_transpose: bool = True) -> BcsrOperands:
    """``dtype``: storage dtype of the value blocks — ``np.float32`` exact,
    or ``jnp.bfloat16`` for half the footprint (the SpMM still accumulates
    in f32 on the MXU; ~0.4% per-entry value noise, well inside MMW's
    first-order convergence tolerance — validated in tests/test_ops.py).
    ``store_transpose=False`` drops the S̃ᵀ copy (another third of the
    footprint) in exchange for a segment-sum scatter per transpose matvec.
    """
    import scipy.sparse
    from sig_sdp_mmw_tpu.core.ell import build_st_csr

    weights_dtype = weights_dtype or dtype
    St = build_st_csr(S_csr, Q_csr)
    K = St.shape[0]
    nr = ((K + block - 1) // block) * block
    Kb = nr // block
    s_bcols, s_vals_np, _ = _bcsr_arrays_np(St, block, pad_rows_to=nr,
                                            dtype=np.float32)

    P = St.copy()
    P.data = np.ones_like(P.data)
    B2 = P.multiply(P.transpose()).tocsr()
    Wm = (P - 0.5 * B2).tocsr()
    Wm.sort_indices()
    sw_bcols, sw_vals_np, _ = _bcsr_arrays_np(Wm, block, pad_rows_to=nr,
                                              dtype=np.float32)
    # Host-side consistency check BEFORE any device transfer (device->host
    # readback of raw transfers can hang on tunneled platforms).
    if not np.array_equal(sw_bcols, s_bcols):
        raise AssertionError("weight/value block layouts diverged")
    def _host_cast(arr, dt):
        # Cast on the HOST so the device never sees the f32 copy (a 4GB+
        # transient at million-link scale); ml_dtypes gives numpy a native
        # bfloat16 that transfers directly.
        return jnp.asarray(arr.astype(np.dtype(dt)))

    s_blocks = BlockEll(bcols=jnp.asarray(s_bcols),
                        blocks=_host_cast(s_vals_np, dtype), nrows=nr)
    st_blocks = None
    if store_transpose:
        StT = St.transpose().tocsr()
        st_bcols, st_vals_np, _ = _bcsr_arrays_np(StT, block, pad_rows_to=nr,
                                                  dtype=np.float32)
        st_blocks = BlockEll(bcols=jnp.asarray(st_bcols),
                             blocks=_host_cast(st_vals_np, dtype),
                             nrows=nr)
    sw = BlockEll(bcols=jnp.asarray(sw_bcols),
                  blocks=_host_cast(sw_vals_np, weights_dtype),
                  nrows=nr)

    # Association edges -> block scatter layout.
    Qu = scipy.sparse.triu(Q_csr.tocsr(), k=1).tocoo()
    E = Qu.nnz
    ii = np.concatenate([Qu.row, Qu.col]).astype(np.int64)
    jj = np.concatenate([Qu.col, Qu.row]).astype(np.int64)
    ee = np.concatenate([np.arange(E), np.arange(E)]).astype(np.int64)

    bi, bj = ii // block, jj // block
    blk_id = bi * Kb + bj
    uniq = np.unique(blk_id)
    ubr, ubc = uniq // Kb, uniq % Kb
    counts = np.bincount(ubr, minlength=Kb)
    maxblkQ = max(int(counts.max(initial=0)), 1)
    q_bcols = np.zeros((Kb, maxblkQ), np.int32)
    starts = np.zeros(Kb + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    order = np.argsort(ubr, kind="stable")
    slots_of_uniq = np.empty(uniq.size, np.int64)
    slots_of_uniq[order] = np.arange(uniq.size) - starts[ubr[order]]
    q_bcols[ubr, slots_of_uniq] = ubc

    slot_of_edge = slots_of_uniq[np.searchsorted(uniq, blk_id)]
    q_pos = (((bi * maxblkQ + slot_of_edge) * block + ii % block) * block
             + jj % block).astype(np.int32)

    return BcsrOperands(
        s_blocks=s_blocks, st_blocks=st_blocks, sw_vals=sw.blocks,
        q_bcols=jnp.asarray(q_bcols), q_pos=jnp.asarray(q_pos),
        q_eidx=jnp.asarray(ee.astype(np.int32)))


def bcsr_block_gram(bcols: jax.Array, Xb: jax.Array,
                    precision=lax.Precision.HIGHEST) -> jax.Array:
    """Pattern-restricted block Gram: for every (block-row k, slot s),
    ``Xb[k] @ Xb[bcols[k, s]]^T`` -> [Kb, maxblk, B, B].  The all-MXU
    replacement for per-edge gather dots."""
    maxblk = bcols.shape[1]

    def slot(s, acc):
        G = lax.dot_general(Xb, Xb[bcols[:, s]],
                            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                            precision=precision)
        return acc.at[:, s].set(G)

    Kb, B, _ = Xb.shape
    return lax.fori_loop(0, maxblk, slot,
                         jnp.zeros((Kb, maxblk, B, B), Xb.dtype))


def bcsr_block_gram_accum(bcols: jax.Array, Xb: jax.Array, acc: jax.Array,
                          scale, precision=lax.Precision.HIGHEST) -> jax.Array:
    """``acc[k, s] += scale * Xb[k] @ Xb[bcols[k, s]]^T`` slot-by-slot,
    updating the accumulator in place — avoids materializing a second
    full-size [Kb, maxblk, B, B] Gram array (the memory-lean averaging path
    for million-link graphs)."""
    maxblk = bcols.shape[1]

    def slot(s, a):
        G = lax.dot_general(Xb, Xb[bcols[:, s]],
                            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                            precision=precision,
                            preferred_element_type=a.dtype)
        return a.at[:, s].add(scale * G)

    return lax.fori_loop(0, maxblk, slot, acc)


def bcsr_spmm_transpose(mat_bcols: jax.Array, blocks: jax.Array,
                        V: jax.Array,
                        precision=lax.Precision.HIGHEST) -> jax.Array:
    """``A^T @ V`` where A is given in BlockEll form (bcols, blocks):
    per-slot contributions scattered by target block via segment_sum."""
    Kb, maxblk = mat_bcols.shape
    B = blocks.shape[-1]
    D = V.shape[1]
    acc_dtype = V.dtype
    Vb = V.astype(blocks.dtype).reshape(Kb, B, D)

    # Slot-by-slot scatter-add: contrib_s[k] = blocks[k, s]^T @ Vb[k] lands
    # in output block bcols[k, s].  One [Kb, B, D] buffer per step instead of
    # the full [Kb*maxblk, B, D] segment-sum operand (3GB+ at million-link
    # scale — the difference between fitting in HBM and OOM).
    def slot(s, acc):
        contrib = lax.dot_general(
            blocks[:, s], Vb,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=precision,
            preferred_element_type=acc_dtype)            # [Kb, B(col), D]
        return acc.at[mat_bcols[:, s]].add(contrib)

    seg = lax.fori_loop(0, maxblk, slot, jnp.zeros((Kb, B, D), acc_dtype))
    return seg.reshape(Kb * B, D)


def spatial_order(sta_locs: np.ndarray, cell_edge: float) -> np.ndarray:
    """Permutation sorting users by grid cell (row-major), making the
    interference graph banded for block-sparse storage."""
    cx = np.floor(sta_locs[:, 0] / cell_edge).astype(np.int64)
    cy = np.floor(sta_locs[:, 1] / cell_edge).astype(np.int64)
    ncx = int(cx.max(initial=0)) + 1
    return np.argsort(cy * ncx + cx, kind="stable")
