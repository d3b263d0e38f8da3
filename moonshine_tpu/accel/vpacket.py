"""Vector-decode packet traversal ("format V") — the round-5 attack on the
per-visit scalar instruction stream.

The row-format kernels (packet.py) feed every node/leaf field to the VPU
through scalar SMEM reads — 113-240 per visit at the fat-row formats — and
the round-4/5 cost model shows that scalar stream is the dominant share of
a visit (per-visit time grows ~linearly in row reads; a +50-scalar-op
prefetch ring lost 40%). Format V stores each record as an (8, 128) f32
TILE and consumes it vector-side:

  node tile:  sublane s, column 6*g + c  = bound c (lox loy loz hix hiy
              hiz) of child 8*g + s, for g < width/8;
              lane 64+j (sublane 0)      = child-j pointer, f32-encoded
              (>= 0 wide node, -1 empty, <= -2 leaf);
              lane 63 (sublane 0)        = dominant child-sort axis.
              Empty slots carry lo=+BIG / hi=-BIG so the slab test can
              never hit them (no per-slot validity scalar work).
  leaf tile:  sublane s, column 10*g + f = field f (v0 xyz, e1 xyz,
              e2 xyz, tid) of slot 8*g + s. Empty slots: zeros, tid -1.

A visit slices per-child bounds as (8, 1) columns and broadcasts them
against 128-ray chunks, so the slab test / Moller-Trumbore feed entirely
from vector registers. The only scalar consumers left are the per-visit
hit MASK — one cross-lane reduction per 8-child sublane group yields an
int32 bitfield (bit j = "some live lane entered child j") — the
predicated pointer extracts for actually-pushed children, the axis read,
and the stack ops. Results are bit-identical to the row kernels: the
slab/triangle math is the same FMA form per lane, and leaf best-hit
selection replicates the sequential first-slot-wins tie-break.

Traversal order, stack discipline, and the two-visit DMA pipeline are
packet.py's (see its module docstring); reference behavior bar is the
hardware TraceRay in /root/reference/shaders/hrtsystem/intersection.hlsl.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import Hit
from .wide import WideBVH
from . import packet
from .packet import (
    _NEG,
    _load_rays,
    _prep_rays,
    _ray_spec_for,
    _sorted_dispatch,
    _use_interpret,
)

_BIG = 3.0e38
AXIS_LANE = 63
PTR_LANE0 = 64


class VWide(NamedTuple):
    """Tiled wide BVH (format V). Same tree as the source WideBVH —
    identical topology, child order, and slot packing — re-laid-out for
    vector-side decode. Shape-encoded tokens mirror WideBVH so dispatch
    stays static under jit."""

    nodes: jnp.ndarray  # [M, 8, 128] f32
    leaves: jnp.ndarray  # [L, 8, 128] f32
    bounds: jnp.ndarray  # [2, 3] f32 scene AABB (ray-sort keys)
    depth_token: jnp.ndarray  # [depth] u8 zeros
    width_token: jnp.ndarray  # [width] u8 zeros
    leaf_token: jnp.ndarray  # [leaf_slots] u8 zeros
    num_nodes: int
    num_leaves: int
    num_tris: int

    @property
    def max_depth(self) -> int:
        return self.depth_token.shape[0]

    @property
    def width(self) -> int:
        return self.width_token.shape[0]

    @property
    def leaf_slots(self) -> int:
        return self.leaf_token.shape[0]

    @property
    def max_stack(self) -> int:
        return (self.width - 1) * self.max_depth + 1


def tiles_from_rows(nodes_rows: np.ndarray, leaves_rows: np.ndarray,
                    width: int, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Relayout row-format records (wide.assemble_rows) into V tiles.
    Pure numpy; used by build and refit."""
    assert width <= 64, width
    assert cap <= 96, cap
    nodes_rows = nodes_rows.reshape(len(nodes_rows), -1)
    leaves_rows = leaves_rows.reshape(len(leaves_rows), -1)
    M, L = len(nodes_rows), len(leaves_rows)
    w = width
    G = -(-w // 8)
    GL = -(-cap // 8)

    # sublane-group padding: non-multiple-of-8 widths/caps leave the last
    # group's tail slots EMPTY (BIG inverted bounds / tid -1 + zero edges),
    # which the kernels' slab/triangle tests can never hit
    nt = np.zeros((M, 8, 128), np.float32)
    ptr = nodes_rows[:, 6 * w:7 * w]  # [M, w]
    empty = ptr == -1.0
    for c in range(6):
        comp = np.full((M, 8 * G), _BIG if c < 3 else -_BIG, np.float32)
        comp[:, :w] = nodes_rows[:, c * w:(c + 1) * w]
        comp[:, :w][empty] = _BIG if c < 3 else -_BIG
        for g in range(G):
            nt[:, :, 6 * g + c] = comp[:, 8 * g:8 * g + 8]
    nt[:, 0, PTR_LANE0:PTR_LANE0 + w] = ptr
    nt[:, 0, PTR_LANE0 + w:PTR_LANE0 + 8 * G] = -1.0
    nt[:, 0, AXIS_LANE] = nodes_rows[:, 7 * w]

    lt = np.zeros((L, 8, 128), np.float32)
    for f in range(10):
        comp = np.full((L, 8 * GL), -1.0 if f == 9 else 0.0, np.float32)
        comp[:, :cap] = leaves_rows[:, f * cap:(f + 1) * cap]
        for g in range(GL):
            lt[:, :, 10 * g + f] = comp[:, 8 * g:8 * g + 8]
    return nt, lt


def v_from_wide(wbvh: WideBVH) -> VWide:
    """Derive the V tiling from a built WideBVH (host-side numpy pass)."""
    nt, lt = tiles_from_rows(np.asarray(wbvh.nodes), np.asarray(wbvh.leaves),
                             wbvh.width, wbvh.leaf_slots)
    return VWide(
        nodes=jnp.asarray(nt),
        leaves=jnp.asarray(lt),
        bounds=wbvh.bounds,
        depth_token=wbvh.depth_token,
        width_token=wbvh.width_token,
        leaf_token=(wbvh.leaf_token if wbvh.leaf_token is not None
                    else jnp.zeros((8,), jnp.uint8)),
        num_nodes=wbvh.num_nodes,
        num_leaves=wbvh.num_leaves,
        num_tris=wbvh.num_tris,
    )


def _col(tile, c):
    """(8, 1) column slice of an (8, 128) tile."""
    return jax.lax.slice(tile, (0, c), (8, c + 1))


def _make_vkernel(any_hit: bool, dma_rows: bool, width: int, leaf_slots: int,
                  count_visits: bool = False):
    G = -(-width // 8)
    GL = -(-leaf_slots // 8)
    # the per-visit hit bitfield is one int32 (bit 31 included — sign bit
    # shifts extract fine); >32-wide nodes would need a second mask word
    assert width <= 32, width

    def kernel(nodes_ref, leaves_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               *refs):
        cnt_ref = cnt_sc = None
        if count_visits:
            n_out = 1 if any_hit else 4
            refs = list(refs)
            cnt_ref = refs.pop(n_out)
            cnt_sc = refs.pop()
            cnt_sc[0] = 0
            cnt_sc[1] = 0
            refs = tuple(refs)
        if dma_rows:
            if any_hit:
                (occ_ref, stack_ref, node_buf, leaf_buf, sems,
                 dma_ref) = refs
            else:
                (t_ref, tri_ref, u_ref, v_ref, stack_ref, node_buf,
                 leaf_buf, sems, dma_ref) = refs
        else:
            if any_hit:
                (occ_ref, stack_ref) = refs
            else:
                (t_ref, tri_ref, u_ref, v_ref, stack_ref) = refs

        o, d, inv_d, oinv, tmax = _load_rays(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref)
        )
        rows = ox_ref.shape[1]
        live0 = tmax > 0.0
        dir_sign = tuple(
            jnp.sum(jnp.where(live0, c, 0.0)) >= 0.0 for c in d
        )
        if any_hit:
            occ_ref[0] = jnp.zeros_like(occ_ref[0])
        else:
            t_ref[0] = tmax
            tri_ref[0] = jnp.full_like(tri_ref[0], -1)
            u_ref[0] = jnp.zeros_like(u_ref[0])
            v_ref[0] = jnp.zeros_like(v_ref[0])

        stack_ref[0] = 0

        def fetch_start(buf, node):
            @pl.when(node >= 0)
            def _():
                pltpu.make_async_copy(
                    nodes_ref.at[jnp.maximum(node, 0)],
                    node_buf.at[buf], sems.at[buf],
                ).start()

            @pl.when(node < 0)
            def _():
                pltpu.make_async_copy(
                    leaves_ref.at[jnp.maximum(-2 - node, 0)],
                    leaf_buf.at[buf], sems.at[buf],
                ).start()

        def fetch_wait(buf, node):
            @pl.when(node >= 0)
            def _():
                pltpu.make_async_copy(
                    nodes_ref.at[jnp.maximum(node, 0)],
                    node_buf.at[buf], sems.at[buf],
                ).wait()

            @pl.when(node < 0)
            def _():
                pltpu.make_async_copy(
                    leaves_ref.at[jnp.maximum(-2 - node, 0)],
                    leaf_buf.at[buf], sems.at[buf],
                ).wait()

        if dma_rows:
            dma_ref[0] = 0
            dma_ref[1] = 0
            dma_ref[2] = 1
            fetch_start(jnp.int32(0), jnp.int32(0))

        # sublane index / per-sublane bit weight, shared by every visit
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sub_bits = jnp.int32(1) << sub_iota

        def cond(carry):
            if any_hit:
                top, all_done, _ = carry
                return (top > 0) & jnp.logical_not(all_done)
            return carry > 0

        def body(carry):
            top = carry[0] if any_hit else carry
            slot = top - 1
            node = stack_ref[slot]
            if count_visits:
                cnt_sc[0] += 1
                cnt_sc[1] += (node >= 0).astype(jnp.int32)
            if dma_rows:
                cur = dma_ref[0]
                fetch_wait(cur, node)
                dma_ref[2] = 0
                pred = stack_ref[jnp.maximum(slot - 1, 0)]
                do_pref = slot > 0

                @pl.when(do_pref)
                def _():
                    fetch_start(1 - cur, pred)

            if any_hit:
                occ_now = occ_ref[0]
                live = live0 & (occ_now == 0)
                prune = tmax
            else:
                prune = t_ref[0]

            def node_tile():
                if dma_rows:
                    return node_buf[cur]
                return nodes_ref[jnp.maximum(node, 0)]

            def leaf_tile():
                if dma_rows:
                    return leaf_buf[cur]
                return leaves_ref[jnp.maximum(-2 - node, 0)]

            def internal(top):
                tile = node_tile()
                axis = tile[0, AXIS_LANE]
                fwd = jax.lax.select(
                    axis < 0.5, dir_sign[0],
                    jax.lax.select(axis < 1.5, dir_sign[1], dir_sign[2]),
                )
                # per-group hit bitfields: one (8,128) mask accumulated
                # over ray chunks, then ONE cross-lane reduction per group
                # (vs one jnp.any per child in the row kernels)
                mask = jnp.int32(0)
                for g in range(G):
                    lo = [_col(tile, 6 * g + c) for c in range(3)]
                    hi = [_col(tile, 6 * g + 3 + c) for c in range(3)]
                    acc = None
                    for r in range(rows):
                        ivx = inv_d[0][r][None, :]
                        ivy = inv_d[1][r][None, :]
                        ivz = inv_d[2][r][None, :]
                        t0x = lo[0] * ivx - oinv[0][r][None, :]
                        t1x = hi[0] * ivx - oinv[0][r][None, :]
                        t0y = lo[1] * ivy - oinv[1][r][None, :]
                        t1y = hi[1] * ivy - oinv[1][r][None, :]
                        t0z = lo[2] * ivz - oinv[2][r][None, :]
                        t1z = hi[2] * ivz - oinv[2][r][None, :]
                        tnear = jnp.maximum(
                            jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.minimum(t0z, t1z),
                        )
                        tfar = jnp.minimum(
                            jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.maximum(t0z, t1z),
                        )
                        pr = prune[r][None, :]
                        hitm = (jnp.maximum(tnear, 0.0)
                                <= jnp.minimum(tfar, pr))
                        if any_hit:
                            hitm = hitm & live[r][None, :]
                        bits = jnp.where(hitm, sub_bits, 0)
                        acc = bits if acc is None else acc | bits
                    # lanes: OR == max (each sublane holds one distinct
                    # bit); sublanes: OR == sum (disjoint bits)
                    g_mask = jnp.sum(jnp.max(acc, axis=1)).astype(jnp.int32)
                    mask = mask | (g_mask << (8 * g))

                base = top - 1

                def push_loop(idxs):
                    pushed = jnp.int32(0)
                    for j in idxs:
                        do_push = ((mask >> j) & 1) != 0
                        idx = base + pushed

                        @pl.when(do_push)
                        def _(idx=idx, j=j):
                            stack_ref[idx] = tile[0, PTR_LANE0 + j].astype(
                                jnp.int32)

                        pushed = pushed + do_push.astype(jnp.int32)
                    return base + pushed

                return jax.lax.cond(
                    fwd,
                    lambda: push_loop(range(width - 1, -1, -1)),
                    lambda: push_loop(range(width)),
                )

            def leaf(top):
                tile = leaf_tile()
                if any_hit:
                    found_rows = []
                    for r in range(rows):
                        orow = [o[c][r][None, :] for c in range(3)]
                        drow = [d[c][r][None, :] for c in range(3)]
                        lrow = live[r][None, :]
                        trow = tmax[r][None, :]
                        found = None
                        for g in range(GL):
                            v0 = [_col(tile, 10 * g + c) for c in range(3)]
                            e1 = [_col(tile, 10 * g + 3 + c)
                                  for c in range(3)]
                            e2 = [_col(tile, 10 * g + 6 + c)
                                  for c in range(3)]
                            tid = _col(tile, 10 * g + 9)
                            valid = packet._moller_trumbore_anyhit(
                                v0, e1, e2, orow, drow, trow)
                            valid = valid & (tid >= 0.0) & lrow
                            anyv = jnp.max(valid.astype(jnp.int32), axis=0,
                                           keepdims=True)
                            found = anyv if found is None else found | anyv
                        found_rows.append(found[0])
                    found_all = jnp.stack(found_rows, axis=0)
                    occ_ref[0] = jnp.maximum(occ_ref[0], found_all)
                    return top - 1

                t_all = t_ref[0]
                tri_all = tri_ref[0]
                u_all = u_ref[0]
                v_all = v_ref[0]
                rt, rtri, ru, rv = [], [], [], []
                for r in range(rows):
                    orow = [o[c][r][None, :] for c in range(3)]
                    drow = [d[c][r][None, :] for c in range(3)]
                    t_r = t_all[r][None, :]
                    tri_r = tri_all[r][None, :]
                    u_r = u_all[r][None, :]
                    v_r = v_all[r][None, :]
                    for g in range(GL):
                        v0 = [_col(tile, 10 * g + c) for c in range(3)]
                        e1 = [_col(tile, 10 * g + 3 + c) for c in range(3)]
                        e2 = [_col(tile, 10 * g + 6 + c) for c in range(3)]
                        tid = _col(tile, 10 * g + 9)
                        valid, t, u, v = packet._moller_trumbore(
                            v0, e1, e2, orow, drow, t_r, fast=dma_rows)
                        valid = valid & (tid >= 0.0)
                        tm = jnp.where(valid, t, _BIG)
                        tmin = jnp.min(tm, axis=0, keepdims=True)  # (1,128)
                        # first-slot-wins tie-break (replicates the row
                        # kernels' sequential slot loop exactly)
                        elig = valid & (t == tmin)
                        sel = jnp.min(jnp.where(elig, sub_iota, 8), axis=0,
                                      keepdims=True)
                        pick = elig & (sub_iota == sel)
                        pickf = lambda x: jnp.max(
                            jnp.where(pick, x, -_BIG), axis=0, keepdims=True)
                        take = tmin < t_r  # strict: earlier visits win ties
                        t_r = jnp.where(take, tmin, t_r)
                        tri_r = jnp.where(take,
                                          pickf(tid + jnp.zeros_like(t))
                                          .astype(jnp.int32), tri_r)
                        u_r = jnp.where(take, pickf(u), u_r)
                        v_r = jnp.where(take, pickf(v), v_r)
                    rt.append(t_r[0])
                    rtri.append(tri_r[0])
                    ru.append(u_r[0])
                    rv.append(v_r[0])
                t_ref[0] = jnp.stack(rt, axis=0)
                tri_ref[0] = jnp.stack(rtri, axis=0)
                u_ref[0] = jnp.stack(ru, axis=0)
                v_ref[0] = jnp.stack(rv, axis=0)
                return top - 1

            new_top = jax.lax.cond(node < 0, leaf, internal, top)
            if dma_rows:
                nt_pos = new_top > 0
                next_node = stack_ref[jnp.maximum(new_top - 1, 0)]
                pref_hit = do_pref & nt_pos & (next_node == pred)

                @pl.when(do_pref & jnp.logical_not(pref_hit))
                def _():
                    fetch_wait(1 - cur, pred)

                @pl.when(nt_pos & jnp.logical_not(pref_hit))
                def _():
                    fetch_start(1 - cur, next_node)

                @pl.when(nt_pos)
                def _():
                    dma_ref[0] = 1 - cur
                    dma_ref[1] = next_node
                    dma_ref[2] = 1
            if any_hit:
                vc = carry[2] + 1
                if dma_rows:
                    all_done = jax.lax.cond(
                        (vc & 7) == 0,
                        lambda: jnp.all((occ_ref[0] > 0) | ~live0),
                        lambda: jnp.bool_(False),
                    )
                else:
                    all_done = jnp.all((occ_ref[0] > 0) | ~live0)
                return new_top, all_done, vc
            return new_top

        if any_hit:
            jax.lax.while_loop(
                cond, body,
                (jnp.int32(1), jnp.bool_(False), jnp.int32(0)),
            )
        else:
            jax.lax.while_loop(cond, body, jnp.int32(1))

        if dma_rows:
            @pl.when(dma_ref[2] == 1)
            def _():
                fetch_wait(dma_ref[0], dma_ref[1])

        if count_visits:
            tile = jnp.full_like(cnt_ref[0], cnt_sc[0])
            row = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
            cnt_ref[0] = jnp.where(row == 1, cnt_sc[1], tile)

    return kernel


def _scene_specs(vbvh: VWide, hbm: bool):
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda g: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM)
    anys = pl.BlockSpec(memory_space=pltpu.ANY)
    if hbm:
        node_bytes = int(np.prod(vbvh.nodes.shape)) * 4
        node_spec = (full(vbvh.nodes)
                     if node_bytes <= packet.NODES_VMEM_BUDGET_BYTES
                     else anys)
        return [node_spec, anys]
    return [full(vbvh.nodes), full(vbvh.leaves)]


def _scratch(hbm: bool, dma_rows: bool = True):
    depth = packet.HBM_STACK_DEPTH if hbm else packet.STACK_DEPTH
    stack = pltpu.SMEM((depth,), jnp.int32)
    if not dma_rows:
        return [stack]
    return [
        stack,
        pltpu.VMEM((2, 8, 128), jnp.float32),  # node tiles (double-buffer)
        pltpu.VMEM((2, 8, 128), jnp.float32),  # leaf tiles
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((4,), jnp.int32),
    ]


def fits_vmem(vbvh: VWide) -> bool:
    total = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for a in (vbvh.nodes, vbvh.leaves))
    return total <= packet.VMEM_SCENE_BUDGET_BYTES


def stack_ok(vbvh: VWide, hbm: bool) -> bool:
    depth = vbvh.max_stack
    return depth <= (packet.HBM_STACK_DEPTH if hbm else packet.STACK_DEPTH)


def _closest_impl(vbvh, ray_o, ray_d, t_max, active_in, interpret, hbm,
                  count_visits=False):
    block = 1024 if interpret else (packet.HBM_BLOCK if hbm
                                    else packet.BLOCK)
    rows = block // 128
    rays, Gd, pad, N = _prep_rays(ray_o, ray_d, t_max, active_in, block)
    out_shapes = [
        jax.ShapeDtypeStruct((Gd, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((Gd, rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((Gd, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((Gd, rows, 128), jnp.float32),
    ]
    out_spec = _ray_spec_for(rows)
    out_specs = [out_spec] * 4
    scratch = _scratch(hbm, dma_rows=not interpret)
    if count_visits:
        out_shapes.append(jax.ShapeDtypeStruct((Gd, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch = scratch + [pltpu.SMEM((2,), jnp.int32)]
    out = pl.pallas_call(
        _make_vkernel(any_hit=False, dma_rows=not interpret,
                      width=vbvh.width, leaf_slots=vbvh.leaf_slots,
                      count_visits=count_visits),
        grid=(Gd,),
        in_specs=_scene_specs(vbvh, hbm) + [_ray_spec_for(rows)] * 7,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(vbvh.nodes, vbvh.leaves, *rays)
    t, tri, u, v = out[:4]
    flat = lambda x: x.reshape(-1)[:N]
    tmax_orig = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    tri = flat(tri)
    t = jnp.where(tri >= 0, flat(t), tmax_orig)
    hit = Hit(t=t, tri=tri, u=flat(u), v=flat(v))
    return (hit, out[4]) if count_visits else hit


def _anyhit_impl(vbvh, ray_o, ray_d, t_max, active_in, interpret, hbm,
                 count_visits=False):
    block = 1024 if interpret else (packet.HBM_BLOCK if hbm
                                    else packet.BLOCK)
    rows = block // 128
    rays, Gd, pad, N = _prep_rays(ray_o, ray_d, t_max, active_in, block)
    out_shapes = [jax.ShapeDtypeStruct((Gd, rows, 128), jnp.int32)]
    out_specs = [_ray_spec_for(rows)]
    scratch = _scratch(hbm, dma_rows=not interpret)
    if count_visits:
        out_shapes.append(jax.ShapeDtypeStruct((Gd, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch = scratch + [pltpu.SMEM((2,), jnp.int32)]
    out = pl.pallas_call(
        _make_vkernel(any_hit=True, dma_rows=not interpret,
                      width=vbvh.width, leaf_slots=vbvh.leaf_slots,
                      count_visits=count_visits),
        grid=(Gd,),
        in_specs=_scene_specs(vbvh, hbm) + [_ray_spec_for(rows)] * 7,
        out_specs=out_specs if count_visits else out_specs[0],
        out_shape=out_shapes if count_visits else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(vbvh.nodes, vbvh.leaves, *rays)
    occ = out[0] if count_visits else out
    occ = occ.reshape(-1)[:N] > 0
    return (occ, out[1]) if count_visits else occ


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def closest_hit_vpacket(vbvh: VWide, ray_o, ray_d, t_max,
                        active_in=None, interpret: bool | None = None,
                        sort: bool = False) -> Hit:
    if interpret is None:
        interpret = _use_interpret()
    if sort and not interpret:
        return _sorted_dispatch(_closest_impl, vbvh, ray_o, ray_d, t_max,
                                active_in, interpret, hbm=False)
    return _closest_impl(vbvh, ray_o, ray_d, t_max, active_in, interpret,
                         hbm=False)


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def any_hit_vpacket(vbvh: VWide, ray_o, ray_d, t_max,
                    active_in=None, interpret: bool | None = None,
                    sort: bool = False):
    if interpret is None:
        interpret = _use_interpret()
    if sort and not interpret:
        return _sorted_dispatch(_anyhit_impl, vbvh, ray_o, ray_d, t_max,
                                active_in, interpret, hbm=False)
    return _anyhit_impl(vbvh, ray_o, ray_d, t_max, active_in, interpret,
                        hbm=False)


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def closest_hit_vpacket_hbm(vbvh: VWide, ray_o, ray_d, t_max,
                            active_in=None, interpret: bool | None = None,
                            sort: bool = True) -> Hit:
    if interpret is None:
        interpret = _use_interpret()
    if interpret:
        return _closest_impl(vbvh, ray_o, ray_d, t_max, active_in, True,
                             hbm=False)
    if not sort:
        return _closest_impl(vbvh, ray_o, ray_d, t_max, active_in, False,
                             hbm=True)
    return _sorted_dispatch(_closest_impl, vbvh, ray_o, ray_d, t_max,
                            active_in, False, hbm=True)


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def any_hit_vpacket_hbm(vbvh: VWide, ray_o, ray_d, t_max,
                        active_in=None, interpret: bool | None = None,
                        sort: bool = True):
    if interpret is None:
        interpret = _use_interpret()
    if interpret:
        return _anyhit_impl(vbvh, ray_o, ray_d, t_max, active_in, True,
                            hbm=False)
    if not sort:
        return _anyhit_impl(vbvh, ray_o, ray_d, t_max, active_in, False,
                            hbm=True)
    return _sorted_dispatch(_anyhit_impl, vbvh, ray_o, ray_d, t_max,
                            active_in, False, hbm=True)
