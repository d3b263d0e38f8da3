"""Bindless-style texture storage for TPU: one atlas array + a rect table.

The reference binds up to 1024 independently-sized images through a
partially-bound descriptor array with one linear-repeat sampler
(MaterialManager.zig:285-445 TextureManager). XLA wants static shapes, so
instead we shelf-pack every image into a single [H, W, 4] float32 atlas and
address textures by a u32 handle into a rect table; sampling is a manual
bilinear gather with repeat wrapping *within the texture's own rect*,
matching the reference's repeat sampler semantics.

Solid-color "textures" are 1x1 rects, exactly like the reference's
1x1-image constants (MaterialManager.zig:304-315).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class TextureTable(NamedTuple):
    rect: jnp.ndarray  # [K, 4] i32 packed (x, y, w, h) — one gather per lookup


class TextureAtlas(NamedTuple):
    data: jnp.ndarray  # [H*W, 4] f32 (flat so texel fetch is one row gather)
    width: jnp.ndarray  # scalar i32 atlas row stride
    table: TextureTable


class AtlasBuilder:
    """Host-side shelf packer. upload() returns the u32 handle."""

    def __init__(self):
        self.images: list[np.ndarray] = []

    def upload(self, image: np.ndarray) -> int:
        """image: [h, w, c] float32, c in {1,2,3,4}; padded to 4 channels."""
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[..., None]
        h, w, c = img.shape
        if c < 4:
            pad = np.ones((h, w, 4 - c), np.float32)
            img = np.concatenate([img, pad], axis=-1)
        self.images.append(img)
        return len(self.images) - 1

    def upload_solid(self, value) -> int:
        v = np.asarray(value, np.float32).reshape(-1)
        return self.upload(v[None, None, :])

    def build(self) -> TextureAtlas:
        if not self.images:
            self.upload_solid([1.0, 1.0, 1.0, 1.0])
        order = sorted(
            range(len(self.images)), key=lambda i: -self.images[i].shape[0]
        )
        # shelf packing into a width-capped atlas
        max_w = max(img.shape[1] for img in self.images)
        atlas_w = max(_next_pow2(max_w), 64)
        total_area = sum(im.shape[0] * im.shape[1] for im in self.images)
        while atlas_w * atlas_w < total_area * 1.4 and atlas_w < 16384:
            atlas_w *= 2

        xs = np.zeros(len(self.images), np.int32)
        ys = np.zeros(len(self.images), np.int32)
        shelf_x, shelf_y, shelf_h = 0, 0, 0
        for i in order:
            h, w, _ = self.images[i].shape
            if shelf_x + w > atlas_w:
                shelf_y += shelf_h
                shelf_x, shelf_h = 0, 0
            xs[i], ys[i] = shelf_x, shelf_y
            shelf_x += w
            shelf_h = max(shelf_h, h)
        atlas_h = _next_pow2(shelf_y + shelf_h)

        data = np.zeros((atlas_h, atlas_w, 4), np.float32)
        for i, img in enumerate(self.images):
            h, w, _ = img.shape
            data[ys[i] : ys[i] + h, xs[i] : xs[i] + w] = img
        rect = np.stack(
            [
                xs,
                ys,
                np.asarray([im.shape[1] for im in self.images], np.int32),
                np.asarray([im.shape[0] for im in self.images], np.int32),
            ],
            axis=-1,
        )
        return TextureAtlas(
            data=jnp.asarray(data.reshape(-1, 4)),
            width=jnp.asarray(atlas_w, jnp.int32),
            table=TextureTable(rect=jnp.asarray(rect, jnp.int32)),
        )


def _next_pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def sample_texture(atlas: TextureAtlas, tex: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear sample with repeat wrap. tex: [N] i32 handles, uv: [N,2].

    Matches SampleLevel(sampler, uv, 0) with a linear-repeat sampler
    (material.hlsl:150,193-195): texel centers at half-integers, wraparound
    within each texture's own domain. Cost: 1 rect gather + 4 texel gathers.
    """
    rect = atlas.table.rect[tex]  # [N, 4]
    x0 = rect[..., 0]
    y0 = rect[..., 1]
    tw = rect[..., 2].astype(jnp.float32)
    th = rect[..., 3].astype(jnp.float32)

    u = uv[..., 0] * tw - 0.5
    v = uv[..., 1] * th - 0.5
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    fu = (u - iu)[..., None]
    fv = (v - iv)[..., None]

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), n.astype(jnp.int32))

    iu0 = wrap(iu, tw)
    iu1 = wrap(iu + 1, tw)
    iv0 = wrap(iv, th)
    iv1 = wrap(iv + 1, th)

    stride = atlas.width

    def fetch(ix, iy):
        return atlas.data[(y0 + iy) * stride + (x0 + ix)]

    c00 = fetch(iu0, iv0)
    c10 = fetch(iu1, iv0)
    c01 = fetch(iu0, iv1)
    c11 = fetch(iu1, iv1)
    top = c00 + (c10 - c00) * fu
    bot = c01 + (c11 - c01) * fu
    return top + (bot - top) * fv
