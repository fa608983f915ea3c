"""ELL sparse matrix-times-block kernels — the hot op of the sparse backend.

Replaces scipy's CSR SpMV/SpMM (the compiled kernel behind ``mmw.py:91,133``
and inside ``expm_multiply``):

* :func:`ell_spmm` — pure-XLA gather + weighted segment reduction.  XLA
  lowers the row gather to a dynamic-gather loop; fine at moderate sizes and
  fully differentiable/shardable.
* For large K the block-sparse MXU formulation wins decisively
  (SPMM_BENCH.json: 2.1x at K=100k): :func:`sig_sdp_mmw_tpu.ops.bcsr.
  bcsr_spmm` (XLA) and :func:`...bcsr_spmm_pallas` (Pallas DMA pipeline).
  A row-gather Pallas kernel used to live here but per-row dynamic VMEM
  gathers do not lower on TPU Mosaic ("Cannot do int indexing") — the
  gather formulation is fundamentally the wrong shape for the hardware, so
  it was removed in favor of the block kernels.

``out[k, :] = sum_d vals[k, d] * V[cols[k, d], :]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def ell_spmm(cols: jax.Array, vals: jax.Array, V: jax.Array) -> jax.Array:
    """[Kp, deg] ELL x [Kp, D] block -> [Kp, D]; XLA path.

    Accumulates slot-by-slot: each step is one [Kp]-row gather of V plus a
    scaled add — peak live memory O(Kp * D), never the [Kp, deg, D] blowup a
    fused gather-einsum would materialize.
    """
    deg = cols.shape[1]

    def slot(d, acc):
        return acc + vals[:, d][:, None] * V[cols[:, d]]

    return lax.fori_loop(0, deg, slot, jnp.zeros_like(V))


def ell_edge_gather_dot(a_i: jax.Array, a_j: jax.Array, X_half: jax.Array
                        ) -> jax.Array:
    """Per-edge inner products ``<X_half[i], X_half[j]>`` for an edge list —
    the sparse-pattern Gram entries (``mmw.py:187-190``) without ever
    materializing X."""
    return jnp.sum(X_half[a_i] * X_half[a_j], axis=1)
