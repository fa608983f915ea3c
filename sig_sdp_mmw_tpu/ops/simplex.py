"""Random rotations and regular simplex embeddings.

Parity with ``sim_src/linalg_util.py``: random rotation via QR (``:4-14``)
and the random regular Z-vertex simplex embedded in R^D (``:15-35``) — the
geometric object behind the SDP's "different slot" encoding
(X_ij <= -1/(Z-1) is the pairwise inner product of simplex vertices).
Imported-but-unused in the reference's live path (``mmw.py:7``); provided
here as a first-class, jittable utility (useful for alternative rounding
schemes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_rotation(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Haar-ish random orthogonal matrix via QR of a Gaussian."""
    A = jax.random.normal(key, (n, n), dtype)
    Q, R = jnp.linalg.qr(A)
    # Fix the sign ambiguity so the distribution is uniform.
    return Q * jnp.sign(jnp.diagonal(R))[None, :]


def regular_simplex_vertices(Z: int, dtype=jnp.float32) -> jax.Array:
    """[Z, Z-1] coordinates of a regular simplex with unit vertices:
    pairwise inner products are exactly -1/(Z-1)."""
    eye = jnp.eye(Z, dtype=dtype)
    centered = eye - 1.0 / Z
    # Orthonormal basis of the sum-zero subspace via QR of the centering map.
    Q, _ = jnp.linalg.qr(centered[:, : Z - 1])
    V = centered @ Q
    return V / jnp.linalg.norm(V, axis=1, keepdims=True)


def generate_rand_regular_simplex_with_Z_vertices(Z: int, D: int,
                                                  key: jax.Array = None,
                                                  dtype=jnp.float32
                                                  ) -> jax.Array:
    """[Z, D] randomly-rotated regular simplex (reference
    ``linalg_util.py:15-35``)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    V = regular_simplex_vertices(Z, dtype)          # [Z, Z-1]
    if D < Z - 1:
        raise ValueError("need D >= Z-1 to embed a Z-simplex")
    pad = jnp.zeros((Z, D - (Z - 1)), dtype)
    V = jnp.concatenate([V, pad], axis=1)
    R = random_rotation(key, D, dtype)
    return V @ R
