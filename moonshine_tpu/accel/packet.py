"""Pallas packet traversal: the TPU-native TraceRay.

Why this shape: XLA-level per-lane traversal (traverse.py) pays ~1 ms per
while_loop iteration at production ray counts because loop-carried gathers
serialize — measured ceiling a few Mrays/s. These kernels remove gathers
entirely: a *block* of rays (BLOCK lanes as [ROWS, 128] vreg tiles per SoA
component) shares a single traversal stack in SMEM, so every node/triangle
fetch is a scalar-indexed 128-float row and all intersection math runs as
scalar-operand vector ops at full VPU width.

Two residency modes, same logic:
  * VMEM kernels — scene rows live in VMEM; right up to the ~10 MB budget
    (~80k triangles). Fastest.
  * HBM kernels — scene rows stay in HBM; when a child is pushed, its row
    is DMA'd into a stack-parallel VMEM slot and waited at pop. The ~1 us
    DMA latency hides behind the previous visit's vector work (tens of us
    at BLOCK=8192), so multi-million-triangle scenes trace at packet speed.

Divergence trade: a block visits the union of nodes its rays need, so
coherent blocks (primary rays, sorted bounce rays) traverse near-optimally
while incoherent blocks degrade gracefully — the classic packet-traversal
trade, deliberately chosen because the TPU's vector width and the
block-shared scalar stack fit it perfectly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.sortutil import sort_lanes
from .traverse import Hit
from .wide import WideBVH, WIDTH, LEAF_CAP

# Rays per packet. Bigger blocks amortize the per-visit scalar work (stack
# ops, row scalar loads) over more lanes; vector work is proportional. On a
# small scene throughput saturates around BLOCK=8192; heavily incoherent
# big scenes may prefer smaller blocks (divergence) — tune via
# set_block_size.
BLOCK = int(os.environ.get("MSN_BLOCK", "8192"))  # VMEM-path packet width
# HBM-path packet width. Round-5 clean fresh-process curve (room_184k
# bounce-1 closest, w24/c24): 512 -> 68.4, 1024 -> 55.9, 2048 -> 64.8,
# 4096 -> 94.0 ms; anyhit 1024 ~= 2048. The per-visit cost is vector-
# latency-bound, so halving lanes/block beats the union growth down to
# 1024 (the earlier in-process sweep that kept 2048 predates the
# profile_one harness fix — see BASELINE.md round-5).
HBM_BLOCK = int(os.environ.get("MSN_HBM_BLOCK", "1024"))
ROWS = BLOCK // 128
STACK_DEPTH = 512
# the HBM kernel's stack is shallower (it was sized when each slot carried
# a DMA semaphore); traversal pushes at most (WIDTH-1) * depth + 1 entries,
# checked against the tree's build-time depth by stack_ok() at dispatch
HBM_STACK_DEPTH = 256
_NEG = -1.0e30

# VMEM-resident scene rows must fit next to the ray tiles; beyond this the
# traversal dispatch switches to the HBM-streaming kernels.
VMEM_SCENE_BUDGET_BYTES = 10 * 1024 * 1024


def set_block_size(block: int, hbm_block: int | None = None) -> None:
    """Adjust packet widths (multiples of 128). Affects future traces."""
    global BLOCK, ROWS, HBM_BLOCK
    assert block % 128 == 0
    BLOCK = block
    ROWS = block // 128
    if hbm_block is not None:
        assert hbm_block % 128 == 0
        HBM_BLOCK = hbm_block


def fits_vmem(wbvh: WideBVH) -> bool:
    total = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in (wbvh.nodes, wbvh.leaves)
    )
    return total <= VMEM_SCENE_BUDGET_BYTES


def stack_ok(wbvh: WideBVH, hbm: bool) -> bool:
    """True when the tree's worst-case stack occupancy fits the kernel's
    SMEM stack. Static under jit (depth is shape-encoded on WideBVH);
    dispatchers fall back to the per-lane jnp traversal when this fails
    (pathological skewed trees only)."""
    depth = wbvh.max_stack if hasattr(wbvh, "max_stack") else 1
    return depth <= (HBM_STACK_DEPTH if hbm else STACK_DEPTH)


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


def _moller_trumbore_anyhit(v0, e1, e2, o, d, t_max):
    """Division-free occlusion test: scalar triangle vs vector rays.

    Any-hit needs only the boolean, so the barycentric/t divisions of the
    full Moller-Trumbore are replaced by sign-folded comparisons on the
    numerators (u_n/v_n/t_n scaled by |det|) — VPU divides are the most
    expensive ops in the leaf visit and shadow batches are ~40% of
    traversal work. Same acceptance region as _moller_trumbore up to the
    1e-12 det cutoff (exactly: u>=0, v>=0, u+v<=1, 0<t<t_max)."""
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    s = jnp.where(det >= 0.0, 1.0, -1.0)
    tx = o[0] - v0[0]
    ty = o[1] - v0[1]
    tz = o[2] - v0[2]
    u_n = (tx * px + ty * py + tz * pz) * s
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v_n = (d[0] * qx + d[1] * qy + d[2] * qz) * s
    t_n = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * s
    det_a = det * s  # |det|
    return (
        (det_a > 1e-12)
        & (u_n >= 0.0)
        & (v_n >= 0.0)
        & (u_n + v_n <= det_a)
        & (t_n > 0.0)
        & (t_n < t_max * det_a)
    )


def _moller_trumbore(v0, e1, e2, o, d, t_best, fast: bool = False):
    """Scalar triangle vs vector rays. Returns (valid, t, u, v).

    fast=True (compiled kernels only): the per-slot VPU divide becomes an
    approximate reciprocal plus one Newton step (~2^-20 relative) — the
    divide is the most expensive op in the 8-slot leaf visit."""
    px = d[1] * e2[2] - d[2] * e2[1]
    py = d[2] * e2[0] - d[0] * e2[2]
    pz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    det_c = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    if fast:
        inv_det = pl.reciprocal(det_c, approx=True)
        inv_det = inv_det * (2.0 - det_c * inv_det)
    else:
        inv_det = 1.0 / det_c
    tx = o[0] - v0[0]
    ty = o[1] - v0[1]
    tz = o[2] - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
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
    # o*inv precomputed once per block: the slab test then runs as
    # bound*inv - oinv, one FMA per bound instead of sub + mul
    oinv = tuple(o[c] * inv[c] for c in range(3))
    return o, d, inv, oinv, tmax


def _make_kernel(any_hit: bool, dma_rows: bool, count_visits: bool = False,
                 width: int = WIDTH, leaf_slots: int = LEAF_CAP):
    """One traversal kernel. dma_rows=True (all real-TPU dispatches, both
    VMEM- and HBM-resident scenes): visited rows are DMA'd into SMEM
    double buffers with next-pop prefetch — every consumer of a row is a
    scalar, and scalar reads from VMEM pay a vreg-load + lane-extract
    each, so staging the row in SMEM makes the ~60 per-visit reads cheap.
    dma_rows=False (interpret mode / CPU tests): direct array reads.
    count_visits adds a per-block visit-count output (profiling only)."""
    node_multirow = 7 * width + 1 > 128
    leaf_multirow = 10 * leaf_slots > 128
    # decomposition probes, captured at kernel-construction time (see the
    # module-level _PROBE_* knobs; all zero/False in production)
    probe_reads = _PROBE_EXTRA_READS if dma_rows else 0
    probe_push = _PROBE_EXTRA_PUSH if dma_rows else 0
    probe_vec = _PROBE_EXTRA_VEC if dma_rows else 0
    probe_s2v = _PROBE_EXTRA_S2V if dma_rows else 0
    no_prefetch = _PROBE_NO_PREFETCH and dma_rows

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
        live0 = tmax > 0.0
        # block majority direction sign per axis (live lanes vote), used to
        # pick near-first child order at internal visits — computed once
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

        # Two-visit DMA pipelining: start/wait are issued separately so
        # the next pop's row transfers while the current visit's vector
        # work runs. Predicting the next pop as stack[slot-1] is exact
        # whenever the visit pushes nothing — every leaf visit — and
        # pushes never write below the popped slot, so the prediction
        # source is stable. At most one copy per buffer is in flight;
        # waits reconstruct the copy from the recorded node id.
        # (Round 4 measured-and-rejected: a 4-deep stack-slot prefetch
        # ring + a speculative near-child buffer — every row fetched at
        # push time and the likely first child at row-arrival time — is
        # a consistent ~40% LOSS end-to-end: the kernel is bound by the
        # scalar instruction stream, and the ring's per-visit state
        # bookkeeping (~50 extra scalar ops) costs more than the fetch
        # latency it hides. VMEM-resident vs HBM-streamed scenes measure
        # identical at equal block size, so fetch latency was already
        # hidden well enough by this two-buffer scheme.)
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
            # kick off the root row; the loop invariant is "the row for
            # stack[top-1] is in flight into buffer dma_ref[0]"
            dma_ref[0] = 0
            dma_ref[1] = 0
            if no_prefetch:
                dma_ref[2] = 0  # serial-DMA probe: fetch at pop, no overlap
            else:
                dma_ref[2] = 1
                fetch_start(jnp.int32(0), jnp.int32(0))

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
                cnt_sc[1] += (node >= 0).astype(jnp.int32)  # internal visits
            if dma_rows and no_prefetch:
                cur = jnp.int32(0)
                fetch_start(cur, node)
                fetch_wait(cur, node)
            elif dma_rows:
                cur = dma_ref[0]
                fetch_wait(cur, node)
                dma_ref[2] = 0
                # prefetch the predicted next pop into the other buffer
                pred = stack_ref[jnp.maximum(slot - 1, 0)]
                do_pref = slot > 0

                @pl.when(do_pref)
                def _():
                    fetch_start(1 - cur, pred)

            if probe_reads:
                # k synthetic SMEM reads (+ one scalar add each), folded
                # into the node id so they can't be dead-code-eliminated
                acc = jnp.float32(0.0)
                for i in range(probe_reads):
                    col = (i * 13) % 128
                    if node_multirow:
                        acc = acc + node_buf[cur, 0, col]
                    else:
                        acc = acc + node_buf[cur, col]
                node = node + (acc.astype(jnp.int32) & 0)

            if probe_vec:
                # k synthetic full-width vector ops, NaN-folded into tmax
                # (x*a+b can't be proven non-NaN, so the fold is live)
                vj = ox_ref[0]
                for i in range(probe_vec):
                    vj = vj * 1.0000001 + 1e-7
                if any_hit:
                    occ_ref[0] = occ_ref[0] + (vj != vj).astype(jnp.int32)
                else:
                    t_ref[0] = t_ref[0] + jnp.where(vj != vj, 1.0, 0.0)

            if probe_s2v:
                # k synthetic (SMEM read -> scalar-to-vector broadcast ->
                # FMA) chains — the EXACT shape of a production bound
                # consumption. probe_reads measures the read alone and
                # probe_vec a constant-operand vector op; the difference
                # between this slope and (read + vec) isolates the
                # scalar-operand broadcast cost, which otherwise hides in
                # the residual.
                vk = ox_ref[0]
                for i in range(probe_s2v):
                    col = (i * 29) % 128
                    if node_multirow:
                        sv = node_buf[cur, 0, col]
                    else:
                        sv = node_buf[cur, col]
                    vk = vk * 1.0000001 + sv * 1e-30
                if any_hit:
                    occ_ref[0] = occ_ref[0] + (vk != vk).astype(jnp.int32)
                else:
                    t_ref[0] = t_ref[0] + jnp.where(vk != vk, 1.0, 0.0)

            if any_hit:
                occluded = occ_ref[0] > 0
                live = live0 & ~occluded
                prune = tmax
            else:
                prune = t_ref[0]

            # records wider than 128 words are [n, rows, 128]; col is
            # always static, so the //128 split folds at trace time
            def nrow(col):
                if dma_rows:
                    if node_multirow:
                        return node_buf[cur, col // 128, col % 128]
                    return node_buf[cur, col]
                if node_multirow:
                    return nodes_ref[jnp.maximum(node, 0),
                                     col // 128, col % 128]
                return nodes_ref[jnp.maximum(node, 0), col]

            def lrow(col):
                if dma_rows:
                    if leaf_multirow:
                        return leaf_buf[cur, col // 128, col % 128]
                    return leaf_buf[cur, col]
                if leaf_multirow:
                    return leaves_ref[jnp.maximum(-2 - node, 0),
                                      col // 128, col % 128]
                return leaves_ref[jnp.maximum(-2 - node, 0), col]

            def internal(top):
                # read the whole node row BEFORE any push: in HBM mode the
                # first pushed child's DMA reuses (overwrites) this slot
                lo_all = [[nrow(c * width + j) for c in range(3)]
                          for j in range(width)]
                hi_all = [[nrow(3 * width + c * width + j) for c in range(3)]
                          for j in range(width)]
                child_all = [nrow(6 * width + j).astype(jnp.int32)
                             for j in range(width)]
                # children are build-sorted ascending along the node's
                # dominant axis (col 7w); used for the near-child guess
                # here and far-to-near push order below
                axis = nrow(7 * width)
                fwd = jax.lax.select(
                    axis < 0.5, dir_sign[0],
                    jax.lax.select(axis < 1.5, dir_sign[1], dir_sign[2]),
                )
                # hit masks per child slot. On real TPU (dma_rows) the 8
                # masks pack into one int32 bitfield vector OR-folded
                # across sublanes with static-slice tree steps (Mosaic has
                # no OR reduction primitive) — all 8 "any lane entered
                # child j?" answers then come from single-vreg jnp.any's
                # instead of 8 full cross-lane reductions (+6% flagship,
                # bit-identical results). Interpret mode keeps the plain
                # per-child jnp.any (the slice tree interprets ~12x slower).
                # slab test, FMA form: bound*inv - (o*inv) is one fused op
                # per bound, and folding the 3-compare hit test into
                # max(tnear, 0) <= min(tfar, prune) drops ~30% of the
                # per-visit vector ALU. Equivalent to the sub-mul form up
                # to 1-ulp rounding on box boundaries; final hit t/u/v come
                # from exact triangle tests either way. Dead lanes carry
                # prune < 0, so min(tfar, prune) keeps them out of unions.
                child_hits = []
                for j in range(width):
                    t0 = [lo_all[j][c] * inv_d[c] - oinv[c] for c in range(3)]
                    t1 = [hi_all[j][c] * inv_d[c] - oinv[c] for c in range(3)]
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0[0], t1[0]),
                                    jnp.minimum(t0[1], t1[1])),
                        jnp.minimum(t0[2], t1[2]),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0[0], t1[0]),
                                    jnp.maximum(t0[1], t1[1])),
                        jnp.maximum(t0[2], t1[2]),
                    )
                    hit = jnp.maximum(tnear, 0.0) <= jnp.minimum(tfar, prune)
                    if any_hit:
                        hit = hit & live
                    child_hits.append(hit)
                if dma_rows:
                    # i32-wrapped bit masks: 1 << 31 overflows a python
                    # int32 literal but the sign bit is a fine flag
                    bitc = [(1 << j) - (1 << 32) if j == 31 else (1 << j)
                            for j in range(width)]
                    packed = None
                    for j in range(width):
                        bit = jnp.where(child_hits[j], jnp.int32(bitc[j]),
                                        jnp.int32(0))
                        packed = bit if packed is None else packed | bit
                    while packed.shape[0] > 1:
                        half = packed.shape[0] // 2
                        packed = packed[:half] | packed[half:]
                    hits = [
                        jnp.any((packed & bitc[j]) != 0)
                        & (child_all[j] != -1)
                        for j in range(width)
                    ]
                else:
                    hits = [
                        jnp.any(child_hits[j]) & (child_all[j] != -1)
                        for j in range(width)
                    ]
                base = top - 1

                # push far-to-near so the LIFO pops near children first
                # and the per-lane t-prune culls far subtrees
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
                    lambda: push_loop(range(width - 1, -1, -1)),
                    lambda: push_loop(range(width)),
                )

            def leaf(top):
                if any_hit:
                    occ = occ_ref[0]
                else:
                    t_best_l = t_ref[0]
                    tri_best = tri_ref[0]
                    u_best = u_ref[0]
                    v_best = v_ref[0]
                for j in range(leaf_slots):
                    v0 = [lrow(c * leaf_slots + j) for c in range(3)]
                    e1 = [lrow((3 + c) * leaf_slots + j) for c in range(3)]
                    e2 = [lrow((6 + c) * leaf_slots + j) for c in range(3)]
                    tid = lrow(9 * leaf_slots + j).astype(jnp.int32)
                    if any_hit:
                        valid = _moller_trumbore_anyhit(
                            v0, e1, e2, o, d, tmax
                        )
                        occ = jnp.maximum(
                            occ,
                            (valid & (tid >= 0) & live).astype(jnp.int32),
                        )
                    else:
                        valid, t, u, v = _moller_trumbore(
                            v0, e1, e2, o, d, t_best_l, fast=dma_rows
                        )
                        valid = valid & (tid >= 0)
                        t_best_l = jnp.where(valid, t, t_best_l)
                        tri_best = jnp.where(valid, tid, tri_best)
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
            if probe_push:
                # k synthetic predicated stack stores with the real push
                # loop's serialized carry; targets sit at the far end of
                # the SMEM stack, beyond any reachable real top
                pp = jnp.int32(0)
                cap_idx = stack_ref.shape[0] - 1
                for i in range(probe_push):
                    do = ((node >> (i % 4)) & 1) != 0
                    idx = cap_idx - pp

                    @pl.when(do)
                    def _(idx=idx):
                        stack_ref[idx] = node

                    pp = pp + do.astype(jnp.int32)
                new_top = new_top + (pp & 0)
            if dma_rows and not no_prefetch:
                # reconcile the prefetch with the actual next pop: a hit
                # means the row is already arriving; a miss retires the
                # (already overlapped) copy and fetches the right row
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
                    # exit check: Mosaic's full cross-lane jnp.all costs
                    # ~us-scale (round-5 measurement: the /8-gated form
                    # left anyhit at 619 ns/visit vs closest's 81 —
                    # this reduction was most of an anyhit visit). Fold
                    # the still-unoccluded mask with the same static-
                    # slice OR tree as the push mask (log2(rows) vector
                    # ORs + one single-vreg any), cheap enough to run
                    # at every visit — exits also land up to 7 visits
                    # earlier than the /8 gate. _PROBE_EXIT_EVERY > 1
                    # restores the gated form for A/B.
                    def _tree_done():
                        need = ((occ_ref[0] == 0) & live0).astype(jnp.int32)
                        while need.shape[0] > 1:
                            half = need.shape[0] // 2
                            need = need[:half] | need[half:]
                        return jnp.logical_not(jnp.any(need > 0))

                    if _PROBE_EXIT_EVERY == 0:
                        # no early exit: traverse to stack-empty like
                        # closest-hit (occluded lanes still leave the
                        # push unions via the live mask)
                        all_done = jnp.bool_(False)
                    elif _PROBE_EXIT_EVERY == 1:
                        all_done = _tree_done()
                    else:
                        all_done = jax.lax.cond(
                            (vc & (_PROBE_EXIT_EVERY - 1)) == 0,
                            _tree_done,
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
            # drain any copy still in flight (early exit paths)
            @pl.when(dma_ref[2] == 1)
            def _():
                fetch_wait(dma_ref[0], dma_ref[1])

        if count_visits:
            # sublane 0 = total visits, sublane 1 = internal visits
            tile = jnp.full_like(cnt_ref[0], cnt_sc[0])
            row = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
            cnt_ref[0] = jnp.where(row == 1, cnt_sc[1], tile)

    return kernel


def _sort_key(wbvh: WideBVH, ray_o, ray_d, active=None):
    """Coherence key: 4^3 origin cells x 8 direction octants; dead lanes
    sort to the end. Sorting rays before packet traversal makes each block's
    node working set tight, and — since inactive lanes carry tmax<0 and a
    fully-dead block exits after its root visit — packs the (often large)
    dead fraction of a bounce/shadow batch into blocks that cost ~nothing.
    This is the wavefront design's per-bounce compaction + sorting step."""
    lo = wbvh.bounds[0]
    inv_ext = 1.0 / jnp.maximum(wbvh.bounds[1] - lo, 1e-20)
    cell = jnp.clip(((ray_o - lo) * inv_ext * 4.0).astype(jnp.int32), 0, 3)
    octant = (
        (ray_d[:, 0] > 0).astype(jnp.int32) * 4
        + (ray_d[:, 1] > 0).astype(jnp.int32) * 2
        + (ray_d[:, 2] > 0).astype(jnp.int32)
    )
    key = ((cell[:, 0] * 4 + cell[:, 1]) * 4 + cell[:, 2]) * 8 + octant
    if active is not None:
        key = jnp.where(active, key, jnp.int32(1 << 20))
    return key


def _sorted_dispatch(impl, wbvh, ray_o, ray_d, t_max, active_in, interpret,
                     hbm):
    """Run a traversal impl on compaction-sorted rays, unsorting results.

    Both the forward reorder and the inverse are single multi-operand
    lax.sorts (core/sortutil.py): the inactive flag folds into tmax<0
    before the sort so only 8 payloads ride forward, and a lane-index
    iota rides along to key the inverse sort of the outputs."""
    N = ray_o.shape[0]
    key = _sort_key(wbvh, ray_o, ray_d, active_in)
    t_eff = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    if active_in is not None:
        t_eff = jnp.where(active_in, t_eff, _NEG)
    iota = jnp.arange(N, dtype=jnp.int32)
    _, (iota_s, o_s, d_s, t_s) = sort_lanes(
        key, [iota, ray_o, ray_d, t_eff])
    out = impl(wbvh, o_s, d_s, t_s, None, interpret, hbm)
    if isinstance(out, Hit):
        _, (t, tri, u, v) = sort_lanes(
            iota_s, [out.t, out.tri, out.u, out.v])
        return Hit(t=t, tri=tri, u=u, v=v)
    _, (occ,) = sort_lanes(iota_s, [out])
    return occ


def _use_interpret():
    return jax.default_backend() != "tpu"


def _prep_rays(ray_o, ray_d, t_max, active, block):
    N = ray_o.shape[0]
    rows = block // 128
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    if active is not None:
        t_max = jnp.where(active, t_max, _NEG)
    G = -(-N // block)
    pad = G * block - N

    comps = [ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
             ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]]
    comps = [jnp.pad(c, (0, pad)).reshape(G, rows, 128) for c in comps]
    tm = jnp.pad(t_max, (0, pad), constant_values=_NEG).reshape(G, rows, 128)
    return comps + [tm], G, pad, N


def _ray_spec_for(rows):
    return pl.BlockSpec((1, rows, 128), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _scene_specs(wbvh: WideBVH, hbm: bool):
    # 256-word rows must stay HBM-resident: Mosaic tiles VMEM arrays
    # (8,128), so a single-row slice of a 256-col VMEM array is not
    # tile-aligned (HBM is tiled (1,128) — any 128-multiple row slices
    # fine). Measured cost of HBM residency at equal block size: none —
    # the two-visit prefetch hides the stream (profile_vmembudget.py).
    full = lambda arr: (
        pl.BlockSpec(arr.shape, lambda g: tuple(0 for _ in arr.shape),
                     memory_space=pltpu.VMEM)
        if arr.ndim == 2
        else pl.BlockSpec(memory_space=pltpu.ANY)
    )
    if hbm:
        # hybrid residency: internal-node rows usually fit VMEM long
        # after the (much larger) leaf array has outgrown it, and a
        # VMEM->SMEM row copy has far lower latency than HBM->SMEM — so
        # park the nodes in VMEM and stream only leaf rows from HBM
        node_spec = (full(wbvh.nodes) if _nodes_fit_vmem(wbvh)
                     else pl.BlockSpec(memory_space=pltpu.ANY))
        return [node_spec, pl.BlockSpec(memory_space=pltpu.ANY)]
    return [full(wbvh.nodes), full(wbvh.leaves)]


# node-array VMEM budget for the hybrid HBM mode (the full VMEM budget
# is VMEM_SCENE_BUDGET_BYTES; leave room for ray tiles and row buffers)
NODES_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _nodes_fit_vmem(wbvh: WideBVH) -> bool:
    return (int(np.prod(wbvh.nodes.shape)) * wbvh.nodes.dtype.itemsize
            <= NODES_VMEM_BUDGET_BYTES)


def _scratch(hbm: bool, dma_rows: bool = True, any_hit: bool = False,
             node_shape: tuple = (128,), leaf_shape: tuple = (128,)):
    """node_shape/leaf_shape: per-record row shape ((128,) or (k, 128))."""
    depth = HBM_STACK_DEPTH if hbm else STACK_DEPTH
    stack = pltpu.SMEM((depth,), jnp.int32)
    if not dma_rows:
        return [stack]
    return [
        stack,
        # row buffers live in SMEM: every consumer is a scalar read
        # (broadcast against ray vectors), and scalar loads from VMEM
        # pay a vreg-load + lane-extract each — SMEM reads are cheap
        pltpu.SMEM((2,) + tuple(node_shape), jnp.float32),
        pltpu.SMEM((2,) + tuple(leaf_shape), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        # [0] current buffer, [1] in-flight node id, [2] in-flight flag
        pltpu.SMEM((4,), jnp.int32),
    ]


# probe hook (scripts/profile_leafslots.py): intersect only the first N
# leaf slots per visit. None = all of the tree's leaf slots (production).
_LEAF_SLOTS_OVERRIDE: int | None = None

# --- scalar-stream decomposition probes (scripts/profile_scalar.py) ---
# Inject k extra synthetic ops per visit and fit the marginal cost of each
# op class; multiplying by the real kernel's per-visit op counts yields the
# (a) field-decode / (b) stack-push / (c) DMA-protocol split the round-4
# cost model named but never measured. All default to 0/False (production
# kernels are byte-identical). Real-TPU (dma_rows) kernels only.
_PROBE_EXIT_EVERY = 8    # anyhit exit-check interval (OR-tree fold; 1 = every visit, 0 = none).
# A/B (room bounce-1, fixed harness-equivalent): tree@1 41.0 / @4 37.8 /
# @8 36.0 / no-exit 36.2 / original jnp.all@8 37.3 ms -> all within noise;
# the reduction was never the anyhit cost. @8 kept (cheapest measured).
_PROBE_EXTRA_READS = 0   # extra SMEM scalar reads (+ scalar add each)
_PROBE_EXTRA_PUSH = 0    # extra predicated stack stores (+ carry add each)
_PROBE_EXTRA_VEC = 0     # extra full-width vector ops
_PROBE_EXTRA_S2V = 0     # extra read->broadcast->FMA chains (see probe_s2v)
_PROBE_NO_PREFETCH = False  # drop the next-pop prefetch (serial DMA)


def _leaf_slots(wbvh) -> int:
    if _LEAF_SLOTS_OVERRIDE is not None:
        return _LEAF_SLOTS_OVERRIDE
    return wbvh.leaf_slots


def _closest_impl(wbvh, ray_o, ray_d, t_max, active_in, interpret, hbm,
                  count_visits=False):
    # interpret mode (CPU tests/dryruns) pays per-lane python/XLA-CPU cost;
    # keep its blocks small
    block = 1024 if interpret else (HBM_BLOCK if hbm else BLOCK)
    rows = block // 128
    rays, G, pad, N = _prep_rays(ray_o, ray_d, t_max, active_in, block)
    out_shapes = [
        jax.ShapeDtypeStruct((G, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, rows, 128), jnp.float32),
    ]
    out_spec = _ray_spec_for(rows)
    out_specs = [out_spec] * 4
    scratch = _scratch(hbm, dma_rows=not interpret,
                       node_shape=wbvh.nodes.shape[1:],
                       leaf_shape=wbvh.leaves.shape[1:])
    if count_visits:
        out_shapes.append(jax.ShapeDtypeStruct((G, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch = scratch + [pltpu.SMEM((2,), jnp.int32)]
    out = pl.pallas_call(
        _make_kernel(any_hit=False, dma_rows=not interpret,
                     count_visits=count_visits, width=wbvh.width,
                     leaf_slots=_leaf_slots(wbvh)),
        grid=(G,),
        in_specs=_scene_specs(wbvh, hbm) + [_ray_spec_for(rows)] * 7,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(wbvh.nodes, wbvh.leaves, *rays)
    t, tri, u, v = out[:4]
    flat = lambda x: x.reshape(-1)[:N]
    tmax_orig = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    tri = flat(tri)
    t = jnp.where(tri >= 0, flat(t), tmax_orig)
    hit = Hit(t=t, tri=tri, u=flat(u), v=flat(v))
    return (hit, out[4]) if count_visits else hit


def _anyhit_impl(wbvh, ray_o, ray_d, t_max, active_in, interpret, hbm,
                 count_visits=False):
    block = 1024 if interpret else (HBM_BLOCK if hbm else BLOCK)
    rows = block // 128
    rays, G, pad, N = _prep_rays(ray_o, ray_d, t_max, active_in, block)
    out_shapes = [jax.ShapeDtypeStruct((G, rows, 128), jnp.int32)]
    out_specs = [_ray_spec_for(rows)]
    scratch = _scratch(hbm, dma_rows=not interpret, any_hit=True,
                       node_shape=wbvh.nodes.shape[1:],
                       leaf_shape=wbvh.leaves.shape[1:])
    if count_visits:
        out_shapes.append(jax.ShapeDtypeStruct((G, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch = scratch + [pltpu.SMEM((2,), jnp.int32)]
    out = pl.pallas_call(
        _make_kernel(any_hit=True, dma_rows=not interpret,
                     count_visits=count_visits, width=wbvh.width,
                     leaf_slots=_leaf_slots(wbvh)),
        grid=(G,),
        in_specs=_scene_specs(wbvh, hbm) + [_ray_spec_for(rows)] * 7,
        out_specs=out_specs if count_visits else out_specs[0],
        out_shape=out_shapes if count_visits else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(wbvh.nodes, wbvh.leaves, *rays)
    occ = out[0] if count_visits else out
    occ = occ.reshape(-1)[:N] > 0
    return (occ, out[1]) if count_visits else occ


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def closest_hit_packet(wbvh: WideBVH, ray_o, ray_d, t_max,
                       active_in=None, interpret: bool | None = None,
                       sort: bool = False) -> Hit:
    """Drop-in packet replacement for traverse.closest_hit (VMEM scene).

    sort=True compaction-sorts the batch first (see _sort_perm) — use it
    for bounce/shadow batches where many lanes are dead or incoherent;
    primary rays are already scanline-coherent and fully live."""
    if interpret is None:
        interpret = _use_interpret()
    if sort and not interpret:
        return _sorted_dispatch(_closest_impl, wbvh, ray_o, ray_d, t_max,
                                active_in, interpret, hbm=False)
    return _closest_impl(wbvh, ray_o, ray_d, t_max, active_in, interpret,
                         hbm=False)


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def any_hit_packet(wbvh: WideBVH, ray_o, ray_d, t_max,
                   active_in=None, interpret: bool | None = None,
                   sort: bool = False):
    if interpret is None:
        interpret = _use_interpret()
    if sort and not interpret:
        return _sorted_dispatch(_anyhit_impl, wbvh, ray_o, ray_d, t_max,
                                active_in, interpret, hbm=False)
    return _anyhit_impl(wbvh, ray_o, ray_d, t_max, active_in, interpret,
                        hbm=False)


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def closest_hit_packet_hbm(wbvh: WideBVH, ray_o, ray_d, t_max,
                           active_in=None, interpret: bool | None = None,
                           sort: bool = True) -> Hit:
    """HBM-streaming variant for scenes beyond the VMEM budget. Rays are
    coherence-sorted first (big scenes live or die by the block working
    set) unless the caller already keeps its batch sorted (sort=False —
    the integrator's per-bounce state resort)."""
    if interpret is None:
        interpret = _use_interpret()
    if interpret:
        # interpret mode has no DMA engine; logic is identical anyway
        return _closest_impl(wbvh, ray_o, ray_d, t_max, active_in, True,
                             hbm=False)
    if not sort:
        return _closest_impl(wbvh, ray_o, ray_d, t_max, active_in, False,
                             hbm=True)
    return _sorted_dispatch(_closest_impl, wbvh, ray_o, ray_d, t_max,
                            active_in, False, hbm=True)


@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def any_hit_packet_hbm(wbvh: WideBVH, ray_o, ray_d, t_max,
                       active_in=None, interpret: bool | None = None,
                       sort: bool = True):
    if interpret is None:
        interpret = _use_interpret()
    if interpret:
        return _anyhit_impl(wbvh, ray_o, ray_d, t_max, active_in, True,
                            hbm=False)
    if not sort:
        return _anyhit_impl(wbvh, ray_o, ray_d, t_max, active_in, False,
                            hbm=True)
    return _sorted_dispatch(_anyhit_impl, wbvh, ray_o, ray_d, t_max,
                            active_in, False, hbm=True)
