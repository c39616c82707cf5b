"""Unit-sphere <-> equirectangular (ERP) pixel coordinate transforms.

Conventions (matching the reference implementation's observable behavior,
see /root/reference/spherical_surf.cpp:47-74 and
/root/reference/spherical_bundle_adjuster.cpp:268-298):

  * theta = colatitude in [0, pi], measured from +z:  theta = pi * y / H
  * phi   = longitude  in [0, 2*pi), from +x toward +y:  phi = 2*pi * x / W
  * cartesian bearing:  (sin(theta)*cos(phi), sin(theta)*sin(phi), cos(theta))
  * inverse: theta = acos(z), phi = atan2(y, x) wrapped to [0, 2*pi)

All functions are shape-polymorphic over leading batch dimensions and safe
under `vmap`/`jit`. The last axis carries coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def pixel_to_spherical(xy, width, height):
    """ERP pixel (x, y) -> (theta, phi) radians.

    xy: (..., 2) with x = column, y = row (may be fractional).
    Returns (..., 2) stacked as (theta, phi).
    """
    x = xy[..., 0]
    y = xy[..., 1]
    theta = jnp.pi * y / height
    phi = TWO_PI * x / width
    return jnp.stack([theta, phi], axis=-1)


def spherical_to_pixel(tp, width, height):
    """(theta, phi) radians -> ERP pixel (x, y); phi wrapped to [0, 2*pi)."""
    theta = tp[..., 0]
    phi = jnp.mod(tp[..., 1], TWO_PI)
    x = width * phi / TWO_PI
    y = height * theta / jnp.pi
    return jnp.stack([x, y], axis=-1)


def spherical_to_cartesian(tp):
    """(theta, phi) -> unit bearing vector (..., 3)."""
    theta = tp[..., 0]
    phi = tp[..., 1]
    st = jnp.sin(theta)
    return jnp.stack(
        [st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )


def cartesian_to_spherical(v):
    """Unit vector (..., 3) -> (theta, phi) with phi in [0, 2*pi).

    Mirrors the reference's acos/atan2 + wrap (spherical_surf.cpp:63-67).
    z is clipped to [-1, 1] for numerical safety under float32.
    """
    z = jnp.clip(v[..., 2], -1.0, 1.0)
    theta = jnp.arccos(z)
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)
    return jnp.stack([theta, phi], axis=-1)


def pixel_to_bearing(xy, width, height):
    """ERP pixel -> unit bearing vector (the reference's 'lifting',
    spherical_bundle_adjuster.cpp:276-298) as one fused op."""
    return spherical_to_cartesian(pixel_to_spherical(xy, width, height))


def bearing_to_pixel(v, width, height):
    """Unit bearing vector -> ERP pixel."""
    return spherical_to_pixel(cartesian_to_spherical(v), width, height)


def angular_distance(v1, v2):
    """Angle between unit vectors (radians), numerically stable near 0/pi.

    The reference's eval uses acos(dot) (test/feature_test.cpp:29-34);
    we use atan2(|cross|, dot) which is stable in float32.
    """
    dot = jnp.sum(v1 * v2, axis=-1)
    cross = jnp.linalg.norm(jnp.cross(v1, v2), axis=-1)
    return jnp.arctan2(cross, dot)
