"""Material texture storage: one 16-channel block per material.

The reference binds up to 1024 independently-sized images through a
bindless descriptor array and samples five of them per hit (color,
metalness, roughness, emissive, normal — material.hlsl loads + getEmissive
+ getTextureFrame). Five separate bilinear lookups would be ~25 gathers per
bounce on TPU, so instead every material's maps are resampled to a common
per-material resolution at build time and packed channel-wise:

    channels 0-2 color | 3 metalness | 4 roughness | 5-7 emissive
    | 8-9 normal (rg)  | 10-15 pad

One bilinear fetch of the block (4 row gathers of a flat [H*W, 16] atlas)
decodes the whole material. Repeat-wrap bilinear matches the reference's
linear-repeat sampler semantics; differently-sized maps inside one material
are bilinear-upsampled to the largest, a build-time prefilter the reference
doesn't need (its sampler walks each image separately).

The per-material block rect lives inside the packed material row, so there
is no separate rect-table gather at all.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.gather import weighted_gather_rows

BLOCK_CHANNELS = 16
COLOR = slice(0, 3)
METALNESS = 3
ROUGHNESS = 4
EMISSIVE = slice(5, 8)
NORMAL_RG = slice(8, 10)


class MaterialAtlas(NamedTuple):
    data: jnp.ndarray  # [H*W, 16] f32 flat rows
    width: jnp.ndarray  # scalar i32 row stride


def _as_image(source, channels: int) -> np.ndarray:
    """Constant or [h,w,c] image -> [h,w,channels] float32."""
    src = np.asarray(source, np.float32)
    if src.ndim <= 1:
        v = np.broadcast_to(src.reshape(-1)[:channels], (channels,))
        if src.ndim == 0 or src.size < channels:
            v = np.full(channels, float(src.reshape(-1)[0]), np.float32) \
                if src.size == 1 else np.resize(src, channels)
        return np.asarray(v, np.float32).reshape(1, 1, channels)
    if src.ndim == 2:
        src = src[..., None]
    return src[..., :channels].astype(np.float32) if src.shape[-1] >= channels \
        else np.concatenate(
            [src, np.ones((*src.shape[:2], channels - src.shape[-1]), np.float32)],
            axis=-1,
        )


def _resize_bilinear_wrap(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Upsample with the same repeat-wrap bilinear used at runtime."""
    if img.shape[0] == h and img.shape[1] == w:
        return img
    ih, iw = img.shape[:2]
    v = (np.arange(h) + 0.5) / h * ih - 0.5
    u = (np.arange(w) + 0.5) / w * iw - 0.5
    v0 = np.floor(v).astype(np.int64)
    u0 = np.floor(u).astype(np.int64)
    fv = (v - v0)[:, None, None]
    fu = (u - u0)[None, :, None]
    v0w, v1w = v0 % ih, (v0 + 1) % ih
    u0w, u1w = u0 % iw, (u0 + 1) % iw
    top = img[v0w][:, u0w] * (1 - fu) + img[v0w][:, u1w] * fu
    bot = img[v1w][:, u0w] * (1 - fu) + img[v1w][:, u1w] * fu
    return top * (1 - fv) + bot * fv


class MaterialBlockBuilder:
    """Host-side packer: add() returns the block rect (x, y, w, h)."""

    def __init__(self):
        self.blocks: list[np.ndarray] = []

    def add(self, color, metalness, roughness, emissive, normal_rg) -> int:
        imgs = [
            (COLOR, _as_image(color, 3)),
            (slice(METALNESS, METALNESS + 1), _as_image(metalness, 1)),
            (slice(ROUGHNESS, ROUGHNESS + 1), _as_image(roughness, 1)),
            (EMISSIVE, _as_image(emissive, 3)),
            (NORMAL_RG, _as_image(normal_rg, 2)),
        ]
        h = max(im.shape[0] for _, im in imgs)
        w = max(im.shape[1] for _, im in imgs)
        block = np.zeros((h, w, BLOCK_CHANNELS), np.float32)
        for where, im in imgs:
            block[..., where] = _resize_bilinear_wrap(im, h, w)
        self.blocks.append(block)
        return len(self.blocks) - 1

    def build(self):
        """Returns (MaterialAtlas, rects [n, 4] int32 (x, y, w, h))."""
        if not self.blocks:
            self.add((1, 1, 1), 0.0, 1.0, (0, 0, 0), (0.5, 0.5))
        max_w = max(b.shape[1] for b in self.blocks)
        atlas_w = max(_next_pow2(max_w), 16)
        total = sum(b.shape[0] * b.shape[1] for b in self.blocks)
        while atlas_w * atlas_w < total * 1.4 and atlas_w < 16384:
            atlas_w *= 2

        order = sorted(range(len(self.blocks)),
                       key=lambda i: -self.blocks[i].shape[0])
        rects = np.zeros((len(self.blocks), 4), np.int32)
        shelf_x = shelf_y = shelf_h = 0
        for i in order:
            h, w, _ = self.blocks[i].shape
            if shelf_x + w > atlas_w:
                shelf_y += shelf_h
                shelf_x, shelf_h = 0, 0
            rects[i] = (shelf_x, shelf_y, w, h)
            shelf_x += w
            shelf_h = max(shelf_h, h)
        atlas_h = _next_pow2(shelf_y + shelf_h)

        data = np.zeros((atlas_h, atlas_w, BLOCK_CHANNELS), np.float32)
        for i, b in enumerate(self.blocks):
            x, y, w, h = rects[i]
            data[y : y + h, x : x + w] = b
        atlas = MaterialAtlas(
            data=jnp.asarray(data.reshape(-1, BLOCK_CHANNELS)),
            width=jnp.asarray(atlas_w, jnp.int32),
        )
        return atlas, rects


def _next_pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def sample_material_block(atlas: MaterialAtlas, rect: jnp.ndarray,
                          uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear repeat-wrap fetch of full material blocks.

    rect: [N, 4] float or int (x, y, w, h); uv: [N, 2] -> [N, 16].
    """
    x0 = rect[..., 0].astype(jnp.int32)
    y0 = rect[..., 1].astype(jnp.int32)
    tw = rect[..., 2].astype(jnp.float32)
    th = rect[..., 3].astype(jnp.float32)

    u = uv[..., 0] * tw - 0.5
    v = uv[..., 1] * th - 0.5
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    fu = (u - iu)[..., None]
    fv = (v - iv)[..., None]

    wrap = lambda i, n: jnp.mod(i.astype(jnp.int32), n.astype(jnp.int32))
    iu0 = wrap(iu, tw)
    iu1 = wrap(iu + 1, tw)
    iv0 = wrap(iv, th)
    iv1 = wrap(iv + 1, th)

    stride = atlas.width
    idx = lambda ix, iy: (y0 + iy) * stride + (x0 + ix)
    fu1 = fu[..., 0]
    fv1 = fv[..., 0]
    ids = jnp.stack(
        [idx(iu0, iv0), idx(iu1, iv0), idx(iu0, iv1), idx(iu1, iv1)], axis=-1
    )
    weights = jnp.stack(
        [(1 - fu1) * (1 - fv1), fu1 * (1 - fv1), (1 - fu1) * fv1, fu1 * fv1],
        axis=-1,
    )
    # the whole bilinear filter as one fused 4-tap MXU gather
    return weighted_gather_rows(atlas.data, ids, weights)
