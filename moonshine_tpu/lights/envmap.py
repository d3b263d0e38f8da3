"""Environment-map lighting with equal-area parameterization.

Parity targets:
  * preprocessing — shaders/background/*.hlsl via BackgroundManager.zig:
    equirect -> equal-area square resample with 3x3 supersampling
    (equirectangular_to_equal_area.hlsl:16-29), Rec.709 luminance
    (luminance.hlsl), and a *sum* (not average) 2x2 mip pyramid
    (fold.hlsl) that acts as the hierarchical sampling distribution.
  * sampling/eval — EnvMap in shaders/hrtsystem/light.hlsl:34-103:
    binary descent over the luminance mips picks a texel proportional to
    luminance; pdf is (texel luminance * S^2 / integral) / 4pi, uniform
    over the texel's equal-area footprint.

On TPU the three preprocessing compute dispatches collapse into plain
jnp reshapes/sums; the per-bounce hierarchical descent is a short static
loop of gathers (log2(S) steps) over the whole ray batch.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.mappings import (
    cartesian_to_spherical,
    coin_flip_remap,
    square_to_equal_area_sphere,
    square_to_equal_area_sphere_inverse,
)
from ..core.mathutil import PI, luminance


class EnvMap(NamedTuple):
    rgb: jnp.ndarray  # [S, S, 3] equal-area square radiance
    # luminance pyramid, finest (S x S) first, 1x1 last; SUM folds
    lum_mips: tuple


def constant_envmap(rgb=(1.0, 1.0, 1.0)) -> EnvMap:
    """1x1 white-ish default background (BackgroundManager.zig:116-126)."""
    rgb = np.asarray(rgb, np.float32).reshape(1, 1, 3)
    lum = np.asarray(
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2],
        np.float32,
    )
    return EnvMap(rgb=jnp.asarray(rgb), lum_mips=(jnp.asarray(lum),))


def build_envmap(equirect: np.ndarray, size: int | None = None) -> EnvMap:
    """Convert an equirectangular [H, W, 3] image to the sampling-ready
    equal-area representation."""
    equirect = np.asarray(equirect, np.float32)
    if equirect.ndim == 2:
        equirect = equirect[..., None] * np.ones(3, np.float32)
    H, W = equirect.shape[:2]
    if size is None:
        size = int(min(1024, _next_pow2(max(H // 2, 1)) * 2))
    S = max(_next_pow2(size), 1)

    # 3x3 supersampled resample (equirectangular_to_equal_area.hlsl:16-29).
    # Convention: rgb[a, b] covers equal-area square coords
    # (u, v) = ((a+.5)/S, (b+.5)/S) — axis 0 is the first square coordinate.
    spd = 3
    acc = np.zeros((S, S, 3), np.float32)
    px = np.arange(S, dtype=np.float32)
    for i in range(spd):
        for j in range(spd):
            sub = np.asarray([1 + i, 1 + j], np.float32) / (spd + 1)
            u = (px[:, None] + sub[0]) / S
            v = (px[None, :] + sub[1]) / S
            uv = np.stack(np.broadcast_arrays(u, v), axis=-1)
            d = np.asarray(square_to_equal_area_sphere(jnp.asarray(uv)))
            sph = np.asarray(cartesian_to_spherical(jnp.asarray(d)))
            src_u = sph[..., 0] / (2 * PI)
            src_v = sph[..., 1] / PI
            acc += _bilinear_wrap_x(equirect, src_u, src_v)
    rgb = acc / (spd * spd)

    lum = (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    ).astype(np.float32)
    mips = [lum]
    while mips[-1].shape[0] > 1:
        m = mips[-1]
        n = m.shape[0] // 2
        mips.append(
            m.reshape(n, 2, n, 2).sum(axis=(1, 3))  # 2x2 SUM fold (fold.hlsl)
        )
    return EnvMap(
        rgb=jnp.asarray(rgb), lum_mips=tuple(jnp.asarray(m) for m in mips)
    )


def _next_pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def _bilinear_wrap_x(img: np.ndarray, u, v):
    """Bilinear sample, wrapping longitude, clamping latitude."""
    H, W = img.shape[:2]
    x = u * W - 0.5
    y = np.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w = np.mod(x0, W)
    x1w = np.mod(x0 + 1, W)
    y0c = np.clip(y0, 0, H - 1)
    y1c = np.clip(y0 + 1, 0, H - 1)
    top = img[y0c, x0w] * (1 - fx) + img[y0c, x1w] * fx
    bot = img[y1c, x0w] * (1 - fx) + img[y1c, x1w] * fx
    return top * (1 - fy) + bot * fy


def sample_envmap(env: EnvMap, rand2: jnp.ndarray):
    """Hierarchical luminance descent (light.hlsl:47-74).

    rand2: [N, 2] -> (dir_ws [N,3], radiance [N,3], pdf [N]).
    Occlusion is the caller's job (the reference traces inside sample;
    the wavefront design batches shadow rays separately).
    """
    S = env.rgb.shape[0]
    rx = rand2[..., 0]
    ry = rand2[..., 1]
    n = rx.shape[0]
    ix = jnp.zeros(n, jnp.int32)
    iy = jnp.zeros(n, jnp.int32)

    # walk from the 2x2 mip (index -2) to the finest (index 0); the
    # reference's extra 1x1 iteration is a provable no-op.
    for level in range(len(env.lum_mips) - 2, -1, -1):
        m = env.lum_mips[level]
        ix = ix * 2
        iy = iy * 2
        p00 = m[ix, iy]
        p01 = m[ix, iy + 1]
        p10 = m[ix + 1, iy]
        p11 = m[ix + 1, iy + 1]
        col0 = p00 + p01
        col1 = p10 + p11
        takes_x, rx = coin_flip_remap(col1 / jnp.maximum(col0 + col1, 1e-30), rx)
        ix = ix + takes_x.astype(jnp.int32)
        q0 = jnp.where(takes_x, p10, p00)
        q1 = jnp.where(takes_x, p11, p01)
        takes_y, ry = coin_flip_remap(q1 / jnp.maximum(q0 + q1, 1e-30), ry)
        iy = iy + takes_y.astype(jnp.int32)

    integral = env.lum_mips[-1][0, 0]
    lum_texel = env.lum_mips[0][ix, iy]
    discrete_pdf = lum_texel * (S * S) / jnp.maximum(integral, 1e-30)
    uv = (
        jnp.stack([ix, iy], axis=-1).astype(jnp.float32)
        + jnp.stack([rx, ry], axis=-1)
    ) / S
    dir_ws = square_to_equal_area_sphere(uv)
    radiance = env.rgb[ix, iy]
    pdf = discrete_pdf / (4.0 * PI)
    return dir_ws, radiance, pdf


def eval_envmap(env: EnvMap, dir_ws: jnp.ndarray):
    """(radiance [N,3], pdf [N]) of a given direction (light.hlsl:83-97)."""
    S = env.rgb.shape[0]
    uv = square_to_equal_area_sphere_inverse(dir_ws)
    idx = jnp.clip((uv * S).astype(jnp.int32), 0, S - 1)
    integral = env.lum_mips[-1][0, 0]
    lum_texel = env.lum_mips[0][idx[..., 0], idx[..., 1]]
    pdf = lum_texel * (S * S) / jnp.maximum(integral, 1e-30) / (4.0 * PI)
    radiance = env.rgb[idx[..., 0], idx[..., 1]]
    return radiance, pdf


def envmap_incoming_radiance(env: EnvMap, dir_ws: jnp.ndarray):
    """Bilinear-filtered miss radiance (light.hlsl:99-102)."""
    S = env.rgb.shape[0]
    uv = square_to_equal_area_sphere_inverse(dir_ws)
    x = uv[..., 0] * S - 0.5
    y = uv[..., 1] * S - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xi0 = jnp.clip(x0.astype(jnp.int32), 0, S - 1)
    xi1 = jnp.clip(xi0 + 1, 0, S - 1)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, S - 1)
    yi1 = jnp.clip(yi0 + 1, 0, S - 1)
    top = env.rgb[xi0, yi0] * (1 - fx) + env.rgb[xi1, yi0] * fx
    bot = env.rgb[xi0, yi1] * (1 - fx) + env.rgb[xi1, yi1] * fx
    return top * (1 - fy) + bot * fy
