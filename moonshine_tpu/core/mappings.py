"""Low-distortion warps between the unit square and sampling domains.

Behavioral parity target: shaders/utils/mappings.hlsl:5-126. All functions
are branchless/batched: inputs have trailing axis 2 (square points) or 3
(directions) and arbitrary leading batch shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from .mathutil import PI


def square_to_triangle(square):
    """Uniform barycentric (a, b) on the standard triangle (mappings.hlsl:5-9)."""
    s = jnp.sqrt(jnp.maximum(1.0 - square[..., 0], 0.0))
    a = 1.0 - s
    b = square[..., 1] * s
    return jnp.stack([a, b], axis=-1)


def square_to_gaussian(square):
    """Box–Muller standard 2D Gaussian (mappings.hlsl:11-17)."""
    u1 = 1.0 - square[..., 0]
    u2 = square[..., 1]
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-38)))
    theta = 2.0 * PI * u2
    return r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def square_to_uniform_disk_concentric(square):
    """Shirley–Chiu concentric disk warp (mappings.hlsl:19-37)."""
    u = 2.0 * square - 1.0
    ux, uy = u[..., 0], u[..., 1]
    x_major = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(x_major, ux, uy)
    safe = lambda num, den: num / jnp.where(den == 0.0, 1.0, den)
    theta = jnp.where(
        x_major,
        (PI / 4.0) * safe(uy, ux),
        (PI / 2.0) - (PI / 4.0) * safe(ux, uy),
    )
    at_origin = (ux == 0.0) & (uy == 0.0)
    r = jnp.where(at_origin, 0.0, r)
    return r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def square_to_cosine_hemisphere(square):
    """Cosine-weighted upper hemisphere via the disk warp (mappings.hlsl:39-44)."""
    d = square_to_uniform_disk_concentric(square)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, axis=-1)))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def square_to_uniform_hemisphere(square):
    z = square[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * square[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def spherical_to_cartesian(sin_theta, cos_theta, phi):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def cartesian_to_spherical(v):
    """(phi in [0,2pi], theta in [0,pi]) of a unit vector (mappings.hlsl:59-64)."""
    p = jnp.arctan2(v[..., 1], v[..., 0])
    phi = jnp.where(p < 0.0, p + 2.0 * PI, p)
    theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
    return jnp.stack([phi, theta], axis=-1)


def square_to_equal_area_sphere(square):
    """PBRTv4 equal-area square→sphere map (mappings.hlsl:67-83)."""
    uv = 2.0 * square - 1.0
    uvp = jnp.abs(uv)
    signed_distance = 1.0 - (uvp[..., 0] + uvp[..., 1])
    d = jnp.abs(signed_distance)
    r = 1.0 - d
    phi = jnp.where(
        r == 0.0, 1.0, (uvp[..., 1] - uvp[..., 0]) / jnp.where(r == 0.0, 1.0, r) + 1.0
    ) * (PI / 4.0)
    z_mag = 1.0 - r * r
    planar = r * jnp.sqrt(jnp.maximum(2.0 - r * r, 0.0))
    signs = jnp.sign(
        jnp.stack([uv[..., 0], uv[..., 1], signed_distance], axis=-1)
    )
    # sign(0) == 0 would zero the direction; the reference's HLSL sign does
    # the same, and like it we only ever feed this jittered interior points.
    body = jnp.stack(
        [jnp.cos(phi) * planar, jnp.sin(phi) * planar, z_mag], axis=-1
    )
    return signs * body


def square_to_equal_area_sphere_inverse(dir):
    """Inverse equal-area map: unit direction → [0,1]^2 (mappings.hlsl:85-99)."""
    xyz = jnp.abs(dir)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(jnp.maximum(1.0 - z, 0.0))
    both_zero = (x == 0.0) & (y == 0.0)
    phi = jnp.where(
        both_zero,
        0.0,
        jnp.arctan2(jnp.minimum(x, y), jnp.maximum(jnp.maximum(x, y), 1e-38))
        * (2.0 / PI),
    )
    phi = jnp.where(x < y, 1.0 - phi, phi)
    u = r - phi * r
    v = phi * r
    neg = dir[..., 2] < 0.0
    u, v = (
        jnp.where(neg, 1.0 - v, u),
        jnp.where(neg, 1.0 - u, v),
    )
    u = u * jnp.sign(dir[..., 0])
    v = v * jnp.sign(dir[..., 1])
    return jnp.stack([(u + 1.0) / 2.0, (v + 1.0) / 2.0], axis=-1)


def coin_flip_remap(p, rand):
    """Bernoulli(p) decision that recycles the random number.

    Returns (took_true, remapped_rand) — both arrays (mappings.hlsl:103-111).
    """
    take = rand < p
    denom_t = jnp.where(p == 0.0, 1.0, p)
    denom_f = jnp.where(p == 1.0, 1.0, 1.0 - p)
    remapped = jnp.where(take, rand / denom_t, (rand - p) / denom_f)
    return take, remapped
