"""Cubemap face geometry: per-face ray fields and cube<->sphere transforms.

Face layout matches the reference's horizontal strip
left | front | right | back | top | bottom (equi2cube.cpp:282-302).

Per-face ray conventions (cube pixel (i=row, j=col), S = cube_size; from
equi2cube.cpp — back :27-30, front :72-75, left :117-120, right :162-165,
top :207-210, bottom :252-255):

  left  : ( (S-2j)/S,       1,  (S-2i)/S )
  front : (       -1, (S-2j)/S, (S-2i)/S )
  right : ( (2j-S)/S,      -1,  (S-2i)/S )
  back  : (        1, (2j-S)/S, (S-2i)/S )
  top   : ( (S-2i)/S, (S-2j)/S,        1 )
  bottom: ( (2i-S)/S, (S-2j)/S,       -1 )

Instead of six separate loops, `face_rays` builds all six ray fields as one
(6, S, S, 3) tensor in a single fused elementwise expression — XLA tiles it
onto the VPU; the downstream resample is one batched gather.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import sphere

FACE_NAMES = ("left", "front", "right", "back", "top", "bottom")


def _face_frames(dtype=jnp.float32):
    """Per-face (origin_axis, j_axis, i_axis) coefficient triples.

    Ray(face, i, j) = n[face] + a[face] * u(j) + b[face] * v(i), where
    u(j) = (S-2j)/S and v(i) = (S-2i)/S are in [-1, 1].
    """
    # Expressed in terms of u = (S-2j)/S, v = (S-2i)/S:
    #   left  : ( u,  1,  v)       front : (-1,  u,  v)
    #   right : (-u, -1,  v)       back  : ( 1, -u,  v)
    #   top   : ( v,  u,  1)       bottom: (-v,  u, -1)
    n = jnp.array(
        [[0, 1, 0], [-1, 0, 0], [0, -1, 0], [1, 0, 0], [0, 0, 1], [0, 0, -1]],
        dtype=dtype,
    )
    a = jnp.array(
        [[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 1, 0]],
        dtype=dtype,
    )
    b = jnp.array(
        [[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1], [1, 0, 0], [-1, 0, 0]],
        dtype=dtype,
    )
    return n, a, b


def face_rays(cube_size, dtype=jnp.float32):
    """(6, S, S, 3) unnormalized rays for all faces in FACE_NAMES order."""
    s = float(cube_size)
    i = jnp.arange(cube_size, dtype=dtype)
    u = (s - 2.0 * i) / s  # same formula for rows and columns
    n, a, b = _face_frames(dtype)
    # rays[f, i, j, :] = n[f] + a[f]*u[j] + b[f]*u[i]
    rays = (
        n[:, None, None, :]
        + a[:, None, None, :] * u[None, None, :, None]
        + b[:, None, None, :] * u[None, :, None, None]
    )
    return rays


def cube_pixel_to_bearing(xy, cube_size):
    """Cube-strip pixel (x over [0, 6S), y over [0, S)) -> unit bearing.

    Branch-free equivalent of cube2equi_pixel's 6-way if/else
    (equi2cube_surf.cpp:19-57): select the face by x-span, then evaluate
    that face's ray frame. Vectorized over leading dims.
    """
    x = xy[..., 0]
    y = xy[..., 1]
    s = float(cube_size)
    face = jnp.clip((x // s).astype(jnp.int32), 0, 5)
    xf = x - face.astype(x.dtype) * s  # x within the face
    u = (s - 2.0 * xf) / s
    v = (s - 2.0 * y) / s
    n, a, b = _face_frames(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32)
    ray = n[face] + a[face] * u[..., None] + b[face] * v[..., None]
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def cube_pixel_to_erp_pixel(xy, cube_size, width, height):
    """Cube-strip pixel -> ERP pixel (equi2cube_surf.cpp:19-76)."""
    return sphere.bearing_to_pixel(
        cube_pixel_to_bearing(xy, cube_size), width, height
    )
