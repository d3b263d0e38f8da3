"""Pallas packet traversal: the TPU-native TraceRay.

Why this shape: XLA-level per-lane traversal (traverse.py) pays ~1 ms per
while_loop iteration at production ray counts because loop-carried gathers
serialize — measured ceiling a few Mrays/s. This kernel removes gathers
entirely: a *block* of 1024 rays (one [8, 128] vreg tile per component)
shares a single traversal stack in SMEM, so every node/triangle fetch is a
scalar-indexed row and all intersection math runs as scalar-operand vector
ops at full VPU width.

Divergence trade: a block visits the union of nodes its rays need, so
coherent blocks (primary rays, sorted bounce rays) traverse near-optimally
while incoherent blocks degrade gracefully — the classic packet-traversal
trade, deliberately chosen because the TPU's vector width and the
block-shared scalar stack fit it perfectly.

Scene tables (WideBVH) live fully in VMEM: ~0.5 KB per 8-wide node row,
so scenes up to ~1M triangles fit the ~16 MB budget alongside ray tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import Hit
from .wide import WideBVH, WIDTH

# Rays per packet. Bigger blocks amortize the per-visit scalar work
# (stack ops, child-box scalar loads) over more lanes; the vector work is
# proportional. On a tiny scene the throughput asymptote is ~BLOCK=8192;
# big incoherent scenes may prefer smaller blocks (divergence) — tune via
# set_block_size.
BLOCK = 8192
ROWS = BLOCK // 128
STACK_DEPTH = 512


def set_block_size(block: int) -> None:
    """Adjust packet width (multiple of 128). Affects future traces."""
    global BLOCK, ROWS, _ray_spec
    assert block % 128 == 0
    BLOCK = block
    ROWS = block // 128
    _ray_spec = pl.BlockSpec((1, ROWS, 128), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
_NEG = -1.0e30


def _slab_test(lo, hi, o, inv_d):
    """Scalar box (lo, hi triples) vs vector rays; returns (tnear, tfar)."""
    t0 = [(lo[c] - o[c]) * inv_d[c] for c in range(3)]
    t1 = [(hi[c] - o[c]) * inv_d[c] for c in range(3)]
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0[0], t1[0]), jnp.minimum(t0[1], t1[1])),
        jnp.minimum(t0[2], t1[2]),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0[0], t1[0]), jnp.maximum(t0[1], t1[1])),
        jnp.maximum(t0[2], t1[2]),
    )
    return tnear, tfar


def _moller_trumbore(v0, e1, e2, o, d, t_best):
    """Scalar triangle vs vector rays. Returns (valid, t, u, v)."""
    # pvec = d x e2 (e2 scalar)
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tx = o[0] - v0[0]
    ty = o[1] - v0[1]
    tz = o[2] - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
        & (t < t_best)
    )
    return valid, t, u, v


def _load_rays(refs):
    ox, oy, oz, dx, dy, dz, tmax = [r[0] for r in refs]
    o = (ox, oy, oz)
    d = (dx, dy, dz)
    tiny = 1e-12
    inv = tuple(
        1.0 / jnp.where(jnp.abs(c) < tiny, jnp.where(c >= 0, tiny, -tiny), c)
        for c in d
    )
    return o, d, inv, tmax


def _closest_kernel(boxes_ref, ptr_ref, tris_ref, ids_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                    t_ref, tri_ref, u_ref, v_ref,
                    stack_ref):
    o, d, inv_d, tmax = _load_rays(
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref)
    )
    t_ref[0] = tmax
    tri_ref[0] = jnp.full_like(tri_ref[0], -1)
    u_ref[0] = jnp.zeros_like(u_ref[0])
    v_ref[0] = jnp.zeros_like(v_ref[0])

    stack_ref[0] = 0

    def cond(top):
        return top > 0

    def body(top):
        node = stack_ref[top - 1]
        t_best = t_ref[0]

        def internal(top):
            n = node
            pushed = jnp.int32(0)
            base = top - 1
            for j in range(WIDTH):
                lo = [boxes_ref[n, c, j] for c in range(3)]
                hi = [boxes_ref[n, c + 3, j] for c in range(3)]
                child = ptr_ref[n, j]
                tnear, tfar = _slab_test(lo, hi, o, inv_d)
                hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= t_best)
                do_push = jnp.any(hit) & (child != -1)
                idx = base + pushed

                @pl.when(do_push)
                def _():
                    stack_ref[idx] = child

                pushed = pushed + do_push.astype(jnp.int32)
            return base + pushed

        def leaf(top):
            l = -2 - node
            t_best_l = t_ref[0]
            tri_best = tri_ref[0]
            u_best = u_ref[0]
            v_best = v_ref[0]
            for j in range(WIDTH):
                v0 = [tris_ref[l, c, j] for c in range(3)]
                e1 = [tris_ref[l, c + 3, j] for c in range(3)]
                e2 = [tris_ref[l, c + 6, j] for c in range(3)]
                tid = ids_ref[l, j]
                valid, t, u, v = _moller_trumbore(v0, e1, e2, o, d, t_best_l)
                valid = valid & (tid >= 0)
                t_best_l = jnp.where(valid, t, t_best_l)
                tri_best = jnp.where(valid, tid, tri_best)
                u_best = jnp.where(valid, u, u_best)
                v_best = jnp.where(valid, v, v_best)
            t_ref[0] = t_best_l
            tri_ref[0] = tri_best
            u_ref[0] = u_best
            v_ref[0] = v_best
            return top - 1

        return jax.lax.cond(node < 0, leaf, internal, top)

    jax.lax.while_loop(cond, body, jnp.int32(1))


def _anyhit_kernel(boxes_ref, ptr_ref, tris_ref, ids_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                   occ_ref, stack_ref):
    o, d, inv_d, tmax = _load_rays(
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref)
    )
    live0 = tmax > 0.0
    occ_ref[0] = jnp.zeros_like(occ_ref[0])
    stack_ref[0] = 0

    def cond(carry):
        top, all_done = carry
        return (top > 0) & jnp.logical_not(all_done)

    def body(carry):
        top, _ = carry
        node = stack_ref[top - 1]
        occluded = occ_ref[0] > 0
        live = live0 & ~occluded

        def internal(top):
            pushed = jnp.int32(0)
            base = top - 1
            for j in range(WIDTH):
                lo = [boxes_ref[node, c, j] for c in range(3)]
                hi = [boxes_ref[node, c + 3, j] for c in range(3)]
                child = ptr_ref[node, j]
                tnear, tfar = _slab_test(lo, hi, o, inv_d)
                hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= tmax) & live
                do_push = jnp.any(hit) & (child != -1)
                idx = base + pushed

                @pl.when(do_push)
                def _():
                    stack_ref[idx] = child

                pushed = pushed + do_push.astype(jnp.int32)
            return base + pushed

        def leaf(top):
            l = -2 - node
            occ = occ_ref[0]
            for j in range(WIDTH):
                v0 = [tris_ref[l, c, j] for c in range(3)]
                e1 = [tris_ref[l, c + 3, j] for c in range(3)]
                e2 = [tris_ref[l, c + 6, j] for c in range(3)]
                tid = ids_ref[l, j]
                valid, t, u, v = _moller_trumbore(v0, e1, e2, o, d, tmax)
                valid = valid & (tid >= 0) & live
                occ = jnp.maximum(occ, valid.astype(jnp.int32))
            occ_ref[0] = occ
            return top - 1

        new_top = jax.lax.cond(node < 0, leaf, internal, top)
        now_occluded = occ_ref[0] > 0
        all_done = jnp.all(now_occluded | ~live0)
        return new_top, all_done

    jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.bool_(False)))


def _use_interpret():
    return jax.default_backend() != "tpu"


def _prep_rays(ray_o, ray_d, t_max, active):
    N = ray_o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    if active is not None:
        t_max = jnp.where(active, t_max, _NEG)
    G = -(-N // BLOCK)
    pad = G * BLOCK - N

    comps = [ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
             ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]]
    comps = [jnp.pad(c, (0, pad)).reshape(G, ROWS, 128) for c in comps]
    tm = jnp.pad(t_max, (0, pad), constant_values=_NEG).reshape(G, ROWS, 128)
    return comps + [tm], G, pad, N


_ray_spec = pl.BlockSpec((1, ROWS, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)


def _scene_specs(wbvh: WideBVH):
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda g: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM,
    )
    return [full(wbvh.boxes), full(wbvh.ptr), full(wbvh.tris), full(wbvh.ids)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_packet(wbvh: WideBVH, ray_o, ray_d, t_max,
                       active_in=None, interpret: bool | None = None) -> Hit:
    """Drop-in packet replacement for traverse.closest_hit."""
    if interpret is None:
        interpret = _use_interpret()
    rays, G, pad, N = _prep_rays(ray_o, ray_d, t_max, active_in)

    out_shapes = [
        jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, ROWS, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
    ]
    out_spec = pl.BlockSpec((1, ROWS, 128), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        _closest_kernel,
        grid=(G,),
        in_specs=_scene_specs(wbvh) + [_ray_spec] * 7,
        out_specs=[out_spec] * 4,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(wbvh.boxes, wbvh.ptr, wbvh.tris, wbvh.ids, *rays)

    flat = lambda x: x.reshape(-1)[:N]
    t = flat(t)
    # inactive/padded lanes carry the _NEG sentinel; report a clean miss
    tmax_orig = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    tri = flat(tri)
    t = jnp.where(tri >= 0, t, tmax_orig)
    return Hit(t=t, tri=tri, u=flat(u), v=flat(v))


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit_packet(wbvh: WideBVH, ray_o, ray_d, t_max,
                   active_in=None, interpret: bool | None = None):
    if interpret is None:
        interpret = _use_interpret()
    rays, G, pad, N = _prep_rays(ray_o, ray_d, t_max, active_in)
    occ = pl.pallas_call(
        _anyhit_kernel,
        grid=(G,),
        in_specs=_scene_specs(wbvh) + [_ray_spec] * 7,
        out_specs=pl.BlockSpec((1, ROWS, 128), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, ROWS, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(wbvh.boxes, wbvh.ptr, wbvh.tris, wbvh.ids, *rays)
    return occ.reshape(-1)[:N] > 0
