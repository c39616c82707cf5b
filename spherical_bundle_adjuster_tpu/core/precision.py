"""Float32-faithful contractions for geometry/solver math.

On TPU, f32 `einsum`/`dot`/`@` default to bf16 MXU passes (~1e-3 relative
error) — fine for descriptor distances, fatal for rotation chains, normal
equations, and Schur systems. Every geometry- or solver-critical
contraction in this package goes through these helpers; the descriptor
distance matmul (ops/match.py) deliberately does not.

These contractions are tiny (3/6/9-dim inner axes) and bandwidth-bound, so
HIGHEST precision costs nothing on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

einsum = partial(jnp.einsum, precision=HIGHEST)


def matmul(a, b):
    return jnp.matmul(a, b, precision=HIGHEST)
