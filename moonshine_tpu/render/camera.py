"""Thin-lens camera ray generation.

Parity target: shaders/hrtsystem/camera.hlsl:6-43 (viewport construction,
concentric-disk aperture sampling, focus plane) and the Gaussian subpixel
jitter of main.hlsl:54-59.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.mappings import square_to_gaussian, square_to_uniform_disk_concentric
from ..core.mathutil import normalize
from ..scene.types import Lens


class LensArrays(NamedTuple):
    """Lens as a device pytree so it can be a traced jit argument
    (push-constant parity, pipeline.zig:328-331)."""

    origin: jnp.ndarray  # [3]
    forward: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    vfov: jnp.ndarray  # scalar
    aperture: jnp.ndarray  # scalar
    focus_distance: jnp.ndarray  # scalar

    @staticmethod
    def from_lens(lens: Lens) -> "LensArrays":
        return LensArrays(
            origin=jnp.asarray(lens.origin, jnp.float32),
            forward=jnp.asarray(lens.forward, jnp.float32),
            up=jnp.asarray(lens.up, jnp.float32),
            vfov=jnp.asarray(lens.vfov, jnp.float32),
            aperture=jnp.asarray(lens.aperture, jnp.float32),
            focus_distance=jnp.asarray(lens.focus_distance, jnp.float32),
        )


def pixel_uv(px, py, width, height, jitter_rand2, flip_image=True):
    """Jittered uv in [0,1]^2 for integer pixel coords (main.hlsl:54-59).

    The Gaussian AA filter offsets the pixel center; flip_image matches the
    reference's default y-flip.
    """
    center = 0.5 + 0.5 * square_to_gaussian(jitter_rand2)
    u = (px.astype(jnp.float32) + center[..., 0]) / width
    v = (py.astype(jnp.float32) + center[..., 1]) / height
    v = jnp.where(flip_image, 1.0 - v, v)
    return jnp.stack([u, v], axis=-1)


def generate_rays(lens: LensArrays, width, height, uv, aperture_rand2):
    """uv: [N,2] -> (origin [N,3], direction [N,3]). camera.hlsl:14-42."""
    w = -lens.forward
    u_axis = normalize(jnp.cross(lens.up, w))
    v_axis = jnp.cross(w, u_axis)

    aspect = jnp.float32(width) / jnp.float32(height)
    h = jnp.tan(lens.vfov / 2.0)
    viewport_h = 2.0 * h * lens.focus_distance
    viewport_w = aspect * viewport_h

    horizontal = u_axis * viewport_w
    vertical = v_axis * viewport_h
    lower_left = (
        lens.origin
        - horizontal / 2.0
        - vertical / 2.0
        - w * lens.focus_distance
    )

    rd = lens.aperture * square_to_uniform_disk_concentric(aperture_rand2) / 2.0
    defocus = rd[..., 0:1] * u_axis + rd[..., 1:2] * v_axis

    origin = lens.origin + defocus
    target = lower_left + uv[..., 0:1] * horizontal + uv[..., 1:2] * vertical
    direction = normalize(target - defocus - lens.origin)
    return origin, direction
