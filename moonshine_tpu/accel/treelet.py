"""Treelet-scheduled packet traversal for HBM-resident scenes.

The monolithic packet kernels (packet.py) give every block one shared
traversal stack over the WHOLE tree, so an incoherent bounce batch makes
each block traverse the union of its rays' paths — measured ~2.6k row
visits per 4096-lane block on room-interior diffuse bounces, which was THE
throughput gap on the HBM rungs (BASELINE.md round-2 postmortem). Treelet
scheduling splits that one traversal by subtree:

  1. Build time: the wide BVH is partitioned into K subtrees ("treelets",
     wide.plan_treelets) whose root ids + AABBs ride on the WideBVH
     (t_roots / t_lo / t_hi). Pure scheduling metadata — node/leaf rows
     are untouched and stay global.
  2. Phase 1 (jnp, dense): slab-test every ray against every treelet box
     — the top of the tree is replaced by a K-wide vectorized test that
     yields a per-lane PENDING BITMASK [N, ceil(K/32)] plus the nearest
     pending treelet id as a sort key.
  3. One sort (nearest-treelet major, origin-cell/octant minor), then ONE
     Pallas dispatch: each block loops over the union of its lanes'
     pending treelets (a scalar-prefetched per-block OR mask), traversing
     each subtree with the block-shared stack and only the lanes whose
     pending bit is set. The block's dominant treelet runs first so most
     lanes establish t_best immediately and later treelets die at their
     root visit (child slab tests fail against the pruned t).

Every pending treelet is processed in the single dispatch, so closest-hit
results are complete and exact — no scheduling rounds, no [N, K] state
carried between dispatches. The kernel reuses packet.py's visit machinery
(slab tests, Moller-Trumbore, SMEM row staging, two-visit DMA prefetch);
the reference's analogue of all of this is the single hardware TraceRay
(shaders/hrtsystem/intersection.hlsl:18-22).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import Hit
from .wide import WideBVH, WIDTH
from . import packet
from .packet import (
    _load_rays,
    _moller_trumbore,
    _slab_test,
    _NEG,
)

_INF = 3.0e37
# rays per block; smaller than the monolithic HBM kernel's 4096 because a
# block's lanes already agree on their treelet neighborhood — narrower
# blocks mean tighter in-treelet unions at the same scheduling overhead.
TREELET_BLOCK = 2048
MAX_KEYED = 512  # subkey space: 4^3 origin cells x 8 octants


def available(wbvh: WideBVH) -> bool:
    # the treelet kernel is written against the 8-wide node / 8-slot leaf
    # layout only (it's an opt-in experiment; see BASELINE.md round-3
    # rejections)
    return getattr(wbvh, "t_roots", None) is not None and (
        wbvh.t_roots.shape[0] >= 2
    ) and wbvh.width == WIDTH and wbvh.leaf_slots == 8


def _make_kernel(any_hit: bool, dma_rows: bool, K: int,
                 count_visits: bool = False):
    """Pending-mask traversal. Grid = ray blocks; scalar-prefetched
    roots[K], per-block OR'd pending masks [G, K32], and each block's
    dominant treelet [G]. Per present treelet: lanes whose pending bit is
    set traverse the subtree under roots[tid] using the block-shared SMEM
    stack, with the same SMEM row staging + two-visit DMA prefetch as
    packet._make_kernel."""
    K32 = -(-K // 32)

    def kernel(roots_ref, blk_mask_ref, blk_first_ref,
               nodes_ref, leaves_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               pend_ref, *refs):
        cnt_ref = cnt_sc = None
        if count_visits:
            n_out = 1 if any_hit else 4
            refs = list(refs)
            cnt_ref = refs.pop(n_out)
            cnt_sc = refs.pop()
            cnt_sc[0] = 0
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

        o, d, inv_d, _oinv, tmax = _load_rays(
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref)
        )
        if any_hit:
            occ_ref[0] = jnp.zeros_like(occ_ref[0])
        else:
            t_ref[0] = tmax
            tri_ref[0] = jnp.full_like(tri_ref[0], -1)
            u_ref[0] = jnp.zeros_like(u_ref[0])
            v_ref[0] = jnp.zeros_like(v_ref[0])

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

        def run_treelet(tid):
            """One subtree traversal for lanes whose pending bit is set."""
            bits = pend_ref[0, tid >> 5]
            live0 = ((bits >> (tid & 31)) & 1) == 1
            live0 = live0 & (tmax > 0.0)
            if any_hit:
                live0 = live0 & (occ_ref[0] == 0)

            @pl.when(jnp.any(live0))
            def _():
                root = roots_ref[tid]
                dir_sign = tuple(
                    jnp.sum(jnp.where(live0, c, 0.0)) >= 0.0 for c in d
                )
                stack_ref[0] = root
                if dma_rows:
                    dma_ref[0] = 0
                    dma_ref[1] = root
                    dma_ref[2] = 1
                    fetch_start(jnp.int32(0), root)

                def cond(carry):
                    if any_hit:
                        top, all_done = carry
                        return (top > 0) & jnp.logical_not(all_done)
                    return carry > 0

                def body(carry):
                    top = carry[0] if any_hit else carry
                    slot = top - 1
                    node = stack_ref[slot]
                    if count_visits:
                        cnt_sc[0] += 1
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
                        occluded = occ_ref[0] > 0
                        live = live0 & ~occluded
                        prune = tmax
                    else:
                        live = live0
                        prune = t_ref[0]

                    def nrow(col):
                        if dma_rows:
                            return node_buf[cur, col]
                        return nodes_ref[jnp.maximum(node, 0), col]

                    def lrow(col):
                        if dma_rows:
                            return leaf_buf[cur, col]
                        return leaves_ref[jnp.maximum(-2 - node, 0), col]

                    def internal(top):
                        lo_all = [[nrow(c * 8 + j) for c in range(3)]
                                  for j in range(WIDTH)]
                        hi_all = [[nrow(24 + c * 8 + j) for c in range(3)]
                                  for j in range(WIDTH)]
                        child_all = [nrow(48 + j).astype(jnp.int32)
                                     for j in range(WIDTH)]
                        hits = []
                        for j in range(WIDTH):
                            tnear, tfar = _slab_test(
                                lo_all[j], hi_all[j], o, inv_d
                            )
                            # live-mask the slab hit in BOTH modes: lanes
                            # bound for other treelets must never widen
                            # this subtree's union — that is the entire
                            # point of the schedule
                            hit = (
                                (tnear <= tfar)
                                & (tfar >= 0.0)
                                & (tnear <= prune)
                                & live
                            )
                            hits.append(jnp.any(hit) & (child_all[j] != -1))
                        base = top - 1
                        axis = nrow(56)
                        fwd = jax.lax.select(
                            axis < 0.5, dir_sign[0],
                            jax.lax.select(
                                axis < 1.5, dir_sign[1], dir_sign[2]
                            ),
                        )

                        def push_loop(idxs):
                            pushed = jnp.int32(0)
                            for j in idxs:
                                do_push = hits[j]
                                idx = base + pushed

                                @pl.when(do_push)
                                def _():
                                    stack_ref[idx] = child_all[j]

                                pushed = pushed + do_push.astype(jnp.int32)
                            return base + pushed

                        return jax.lax.cond(
                            fwd,
                            lambda: push_loop(range(WIDTH - 1, -1, -1)),
                            lambda: push_loop(range(WIDTH)),
                        )

                    def leaf(top):
                        if any_hit:
                            occ = occ_ref[0]
                        else:
                            t_best_l = t_ref[0]
                            tri_best = tri_ref[0]
                            u_best = u_ref[0]
                            v_best = v_ref[0]
                        for j in range(WIDTH):
                            v0 = [lrow(c * 8 + j) for c in range(3)]
                            e1 = [lrow(24 + c * 8 + j) for c in range(3)]
                            e2 = [lrow(48 + c * 8 + j) for c in range(3)]
                            tid_f = lrow(72 + j).astype(jnp.int32)
                            if any_hit:
                                valid = packet._moller_trumbore_anyhit(
                                    v0, e1, e2, o, d, tmax
                                )
                                occ = jnp.maximum(
                                    occ,
                                    (valid & (tid_f >= 0) & live).astype(
                                        jnp.int32
                                    ),
                                )
                            else:
                                valid, t, u, v = _moller_trumbore(
                                    v0, e1, e2, o, d, t_best_l,
                                    fast=dma_rows
                                )
                                valid = valid & (tid_f >= 0) & live
                                t_best_l = jnp.where(valid, t, t_best_l)
                                tri_best = jnp.where(valid, tid_f, tri_best)
                                u_best = jnp.where(valid, u, u_best)
                                v_best = jnp.where(valid, v, v_best)
                        if any_hit:
                            occ_ref[0] = occ
                        else:
                            t_ref[0] = t_best_l
                            tri_ref[0] = tri_best
                            u_ref[0] = u_best
                            v_ref[0] = v_best
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
                        all_done = jnp.all((occ_ref[0] > 0) | ~live0)
                        return new_top, all_done
                    return new_top

                if any_hit:
                    jax.lax.while_loop(
                        cond, body, (jnp.int32(1), jnp.bool_(False))
                    )
                else:
                    jax.lax.while_loop(cond, body, jnp.int32(1))

                if dma_rows:
                    @pl.when(dma_ref[2] == 1)
                    def _():
                        fetch_wait(dma_ref[0], dma_ref[1])

        g = pl.program_id(0)
        first = blk_first_ref[g]

        # dominant treelet first: most lanes' nearest pending subtree, so
        # t_best lands before the remaining treelets are tried and their
        # root visits prune to nothing
        @pl.when(first < K)
        def _():
            run_treelet(first)

        def tid_body(tid, carry):
            word = blk_mask_ref[g, tid >> 5]
            present = ((word >> (tid & 31)) & 1) == 1

            @pl.when(present & (tid != first))
            def _():
                run_treelet(tid)

            return carry

        jax.lax.fori_loop(0, K, tid_body, jnp.int32(0))

        if count_visits:
            cnt_ref[0] = jnp.full_like(cnt_ref[0], cnt_sc[0])

    return kernel


def _safe_inv(d):
    tiny = 1e-12
    return 1.0 / jnp.where(
        jnp.abs(d) < tiny, jnp.where(d >= 0, tiny, -tiny), d
    )


def _pending_masks(wbvh: WideBVH, o, d, tmax_vec):
    """Phase 1: per-(ray, treelet) slab tests, chunked over K so the
    [N, chunk, 3] broadcasts stay fusible. Returns:
      pend [N, ceil(K/32)] i32 bitmask of treelets the ray enters
      nearest [N] i32 — pending treelet with smallest entry t (K if none)
    """
    K = wbvh.t_roots.shape[0]
    K32 = -(-K // 32)
    inv = _safe_inv(d)
    active = tmax_vec > 0.0
    words = []
    best_t = jnp.full(o.shape[:1], _INF, jnp.float32)
    best_k = jnp.full(o.shape[:1], K, jnp.int32)
    for w in range(K32):
        k0 = w * 32
        k1 = min(k0 + 32, K)
        lo = wbvh.t_lo[k0:k1]
        hi = wbvh.t_hi[k0:k1]
        t0 = (lo[None] - o[:, None]) * inv[:, None]
        t1 = (hi[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hitm = (
            (tn <= tf) & (tf >= 0.0) & (tn <= tmax_vec[:, None])
            & active[:, None]
        )
        bits = jnp.where(
            hitm,
            jnp.int32(1) << jnp.arange(k1 - k0, dtype=jnp.int32)[None],
            0,
        )
        # distinct powers of two per column: sum == bitwise OR
        words.append(bits.sum(axis=1, dtype=jnp.int32))
        te = jnp.where(hitm, jnp.maximum(tn, 0.0), _INF)
        k_local = jnp.argmin(te, axis=1).astype(jnp.int32)
        t_local = jnp.min(te, axis=1)
        better = t_local < best_t
        best_t = jnp.where(better, t_local, best_t)
        best_k = jnp.where(better, k_local + k0, best_k)
    pend = jnp.stack(words, axis=1)
    return pend, best_k


def _subkey(wbvh: WideBVH, o, d):
    """Intra-treelet coherence subkey: 4^3 origin cells x 8 octants (same
    recipe as packet._sort_perm)."""
    lo = wbvh.bounds[0]
    inv_ext = 1.0 / jnp.maximum(wbvh.bounds[1] - lo, 1e-20)
    cell = jnp.clip(((o - lo) * inv_ext * 4.0).astype(jnp.int32), 0, 3)
    octant = (
        (d[:, 0] > 0).astype(jnp.int32) * 4
        + (d[:, 1] > 0).astype(jnp.int32) * 2
        + (d[:, 2] > 0).astype(jnp.int32)
    )
    return ((cell[:, 0] * 4 + cell[:, 1]) * 4 + cell[:, 2]) * 8 + octant


def _dispatch(wbvh: WideBVH, o_s, d_s, t_s, pend_s, first_s,
              any_hit: bool, interpret: bool, count_visits: bool = False):
    """The single traversal dispatch on sorted, padded lane arrays."""
    N = o_s.shape[0]
    K = wbvh.t_roots.shape[0]
    K32 = pend_s.shape[1]
    block = 1024 if interpret else TREELET_BLOCK
    rows = block // 128
    G = -(-N // block)
    pad = G * block - N

    comps = [o_s[:, 0], o_s[:, 1], o_s[:, 2],
             d_s[:, 0], d_s[:, 1], d_s[:, 2]]
    comps = [jnp.pad(c, (0, pad)).reshape(G, rows, 128) for c in comps]
    tm = jnp.pad(t_s, (0, pad), constant_values=_NEG).reshape(G, rows, 128)
    pend_p = jnp.pad(pend_s, ((0, pad), (0, 0)))
    # [G, K32, rows, 128]: per-block pending-bit tiles, word-major so the
    # kernel dynamically indexes the word by tid >> 5
    pend_t = (
        pend_p.reshape(G, rows, 128, K32).transpose(0, 3, 1, 2)
    )
    blk_mask = pend_p.reshape(G, block, K32)
    while blk_mask.shape[1] > 1:  # log-step OR-fold over the block lanes
        blk_mask = blk_mask[:, ::2] | blk_mask[:, 1::2]
    blk_mask = blk_mask[:, 0]
    first_p = jnp.pad(first_s, (0, pad), constant_values=K)
    blk_first = first_p.reshape(G, block)[:, 0].astype(jnp.int32)

    ray_spec = pl.BlockSpec((1, rows, 128), lambda g, *_: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    pend_spec = pl.BlockSpec((1, K32, rows, 128),
                             lambda g, *_: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    if interpret:
        scene_specs = [
            pl.BlockSpec(
                wbvh.nodes.shape, lambda g, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                wbvh.leaves.shape, lambda g, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        scene_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 2

    scratch = [pltpu.SMEM((packet.HBM_STACK_DEPTH,), jnp.int32)]
    if not interpret:
        scratch += [
            pltpu.SMEM((2, 128), jnp.float32),
            pltpu.SMEM((2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((4,), jnp.int32),
        ]

    if any_hit:
        out_specs = [ray_spec]
        out_shape = [jax.ShapeDtypeStruct((G, rows, 128), jnp.int32)]
    else:
        out_specs = [ray_spec] * 4
        out_shape = [
            jax.ShapeDtypeStruct((G, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, rows, 128), jnp.float32),
        ]
    if count_visits:
        out_shape.append(jax.ShapeDtypeStruct((G, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128),
                                      lambda g, *_: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch = scratch + [pltpu.SMEM((1,), jnp.int32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=scene_specs + [ray_spec] * 7 + [pend_spec],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        _make_kernel(any_hit, dma_rows=not interpret, K=K,
                     count_visits=count_visits),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(wbvh.t_roots, blk_mask, blk_first, wbvh.nodes, wbvh.leaves,
      *comps, tm, pend_t)
    flat = lambda x: x.reshape(-1)[:N]
    cnt = out[-1] if count_visits else None
    if any_hit:
        res = flat(out[0])
    else:
        t, tri, u, v = out[:4]
        res = (flat(t), flat(tri), flat(u), flat(v))
    return (res, cnt) if count_visits else res


def _run(wbvh, ray_o, ray_d, t_max, active_in, any_hit, interpret):
    N = ray_o.shape[0]
    tmax_vec = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    if active_in is not None:
        tmax_vec = jnp.where(active_in, tmax_vec, _NEG)
    pend, nearest = _pending_masks(wbvh, ray_o, ray_d, tmax_vec)
    sub = _subkey(wbvh, ray_o, ray_d)
    perm = jnp.argsort(nearest * MAX_KEYED + sub)
    inv_p = jnp.argsort(perm)
    out = _dispatch(
        wbvh, ray_o[perm], ray_d[perm], tmax_vec[perm], pend[perm],
        nearest[perm], any_hit=any_hit, interpret=interpret,
    )
    if any_hit:
        return out[inv_p] > 0
    t, tri, u, v = (a[inv_p] for a in out)
    tmax_orig = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    t = jnp.where(tri >= 0, t, tmax_orig)
    return Hit(t=t, tri=tri, u=u, v=v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_treelet(wbvh: WideBVH, ray_o, ray_d, t_max,
                        active_in=None,
                        interpret: bool | None = None) -> Hit:
    """Treelet-scheduled closest hit (HBM scenes). Same contract as
    packet.closest_hit_packet_hbm."""
    if interpret is None:
        interpret = packet._use_interpret()
    return _run(wbvh, ray_o, ray_d, t_max, active_in, False, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit_treelet(wbvh: WideBVH, ray_o, ray_d, t_max,
                    active_in=None, interpret: bool | None = None):
    if interpret is None:
        interpret = packet._use_interpret()
    return _run(wbvh, ray_o, ray_d, t_max, active_in, True, interpret)
