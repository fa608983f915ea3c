"""ELL sparse matrix-times-block kernels — the hot op of the sparse backend.

Replaces scipy's CSR SpMV/SpMM (the compiled kernel behind ``mmw.py:91,133``
and inside ``expm_multiply``) with two TPU implementations:

* :func:`ell_spmm` — pure-XLA gather + weighted segment reduction.  XLA
  lowers the row gather to a dynamic-gather loop; fine at moderate sizes and
  fully differentiable/shardable.
* :func:`ell_spmm_pallas` — a Pallas kernel that streams row blocks through
  VMEM, looping over the padded degree with per-slot dynamic row gathers
  from the (VMEM-resident) dense block of V.  Padding slots point at row 0
  with value 0, so no masking is needed in the inner loop.

Both compute ``out[k, :] = sum_d vals[k, d] * V[cols[k, d], :]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _spmm_kernel(cols_ref, vals_ref, v_ref, out_ref):
    """Pallas body: one row-block of the output per grid step.

    cols_ref/vals_ref: [BLK, deg] in VMEM; v_ref: [Kp, D] full (VMEM);
    out_ref: [BLK, D].
    """
    deg = cols_ref.shape[1]
    D = v_ref.shape[1]
    blk = cols_ref.shape[0]

    acc = jnp.zeros((blk, D), jnp.float32)
    for d in range(deg):                      # static unroll over padded degree
        c = cols_ref[:, d]                    # [BLK] int32
        w = vals_ref[:, d]                    # [BLK]
        rows = v_ref[c, :]                    # dynamic row gather [BLK, D]
        acc = acc + w[:, None] * rows
    out_ref[:, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def ell_spmm_pallas(cols: jax.Array, vals: jax.Array, V: jax.Array,
                    block_rows: int = 256, interpret: bool = False
                    ) -> jax.Array:
    Kp, deg = cols.shape
    D = V.shape[1]
    if Kp % block_rows:
        raise ValueError(f"Kp={Kp} not divisible by block_rows={block_rows}")

    grid = (Kp // block_rows,)
    return pl.pallas_call(
        _spmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, deg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, deg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # V replicated per block
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, D), V.dtype),
        interpret=interpret,
    )(cols, vals, V)


def ell_edge_gather_dot(a_i: jax.Array, a_j: jax.Array, X_half: jax.Array
                        ) -> jax.Array:
    """Per-edge inner products ``<X_half[i], X_half[j]>`` for an edge list —
    the sparse-pattern Gram entries (``mmw.py:187-190``) without ever
    materializing X."""
    return jnp.sum(X_half[a_i] * X_half[a_j], axis=1)
