"""8-wide BVH for packet traversal.

Collapses the binary Karras/SAH tree (lbvh.py) into 8-ary nodes: each wide
node repeatedly splits its largest-count child until it has up to 8
children; children covering <= 8 triangles become fat leaves holding fully
unpacked triangle data (v0, e1, e2 per slot) so the traversal kernel never
chases a vertex indirection. Each node's leaf children are then bin-packed
into up-to-8-triangle rows: the kernel pays all 8 Moller-Trumbore slots at
every leaf visit whether occupied or not, so near-full rows are a direct
ALU win (measured 64% occupancy -> ~97% on the 184k room scene, ~1.5x
fewer leaf visits).

The build is fully vectorized except the per-node bin packing (a linear
pass): every binary node covers a *contiguous range* of the sorted
triangle order, so triangle counts and range starts propagate in
depth-bounded bottom-up passes, wide nodes expand breadth-first as flat
[frontier, 8] arrays, and leaves gather their triangles straight from the
sorted order. A 1M-triangle build is seconds, not minutes.

Layout is chosen for the Pallas packet kernel (packet.py): a ray *block*
shares one traversal stack, so node/leaf fetches are scalar-indexed rows —
no per-lane gathers anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import lbvh

LEAF_CAP = 8
WIDTH = 8
# Wider internal nodes amortize the per-visit fixed cost (loop control,
# DMA reconcile, leaf/internal cond dispatch, stack maintenance) over
# twice the children: a 16-wide row still fits the 128-float node layout
# (96 bounds + 16 ptrs + 1 axis = 113) and eliminates every other tree
# level. Box-test vector ALU per ray is *lower* whenever a visited 8-wide
# parent would have pushed >= 1 child (16 tests replace 8 + 8h). Used for
# HBM-resident scenes where the kernel is bound by per-visit fixed work.
WIDTH_WIDE = 16

# Round-4 finding (scripts/profile_leafslots.py): a leaf visit is ~90%
# fixed cost (stack ops, DMA reconcile, loop control) and only ~10% the
# 8-slot Moller-Trumbore vector ALU, and HBM streaming latency is fully
# hidden by the two-visit prefetch (VMEM-resident vs HBM-streamed is a
# wash at equal block size). So rows are packed FAT: storage/DMA
# granularity is 128 f32 lanes (512 B — Mosaic tiles the minor dim to
# 128), and one row = one visit, so the win is more payload per visit:
#   * 12-slot leaves use 120/128 words of the single row (vs 80/128);
#   * 16/24-slot leaves span a 256-word row (one (256,) DMA);
#   * 24/32-wide nodes span a 256-word row (169/225 of 256 words).
# Halving visit counts at ~2x vector work per visit is a direct win when
# visits are fixed-cost-bound. All layouts stay comp-major with
# stride = slot count; slot counts are shape-encoded on WideBVH.


def _leaf_row_len(leaf_cap: int) -> int:
    return 128 if leaf_cap * 10 <= 128 else 256


def _node_row_len(width: int) -> int:
    return 128 if 7 * width + 1 <= 128 else 256


class WideTopology(NamedTuple):
    """Host-side (numpy) record of everything geometry-independent about a
    wide BVH: which binary node backs each internal child slot, the child
    pointers, and each leaf bin's triangle ids. `assemble_rows` turns it
    plus fresh binary-node AABBs + triangle vertices into node/leaf rows —
    the wide analogue of the reference's TLAS update-mode rebuild
    (Accel.zig:567-679). Leaf-bin boxes are computed from the triangles
    themselves, so refits need no per-leaf binary bookkeeping.

    Child slot order and the dominant axis (col 56) are frozen at build:
    after large motion the near-first ordering degrades (ordering is a
    performance hint, never a correctness input), exactly like a refit
    hardware TLAS degrades until the next full rebuild.
    """

    int_ids: np.ndarray  # [W, width] i64 binary node per internal slot, -1 else
    ptr: np.ndarray  # [W, width] i64 child pointers (wide id / -1 / -2-leaf)
    node_axis: np.ndarray  # [W] i64
    orig: np.ndarray  # [L, 8] i64 original triangle ids, -1 padding
    in_range: np.ndarray  # [L, 8] bool occupied tri slots
    n_levels: int
    leaf_cap: int
    # [K] ptr-encoded treelet entry points (>=0 wide node, <=-2 leaf) that
    # tile the whole tree; see plan_treelets. Scheduling metadata only —
    # traversal through nodes/leaves is unchanged.
    treelet_roots: np.ndarray
    # children per internal node (8 or 16); node row layout is
    # lo c*w+j | hi 3w+c*w+j | ptr 6w+j | axis 7w — identical to the
    # historical layout at w=8. Leaf rows are always 8-slot.
    width: int = WIDTH
    # spatial-split (SBVH presplit) clipped reference boxes per leaf slot,
    # [L, cap, 3] each, or None when the build had no presplit. Build-time
    # leaf boxes come from these (tight); refits after motion fall back to
    # full-triangle boxes (stale clips could uncover moved geometry).
    clip_lo: np.ndarray | None = None
    clip_hi: np.ndarray | None = None


def assemble_rows(topo: WideTopology, b_min: np.ndarray, b_max: np.ndarray,
                  tri_verts: np.ndarray, use_clip: bool = False
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Node/leaf rows from frozen topology + current binary-node AABBs +
    current triangle vertices. Pure numpy; called by build and refit.
    use_clip=True (build time): leaf boxes from the spatial-split clipped
    reference boxes when the topology carries them."""
    W_n = len(topo.ptr)
    cap = topo.leaf_cap
    L = len(topo.orig)
    w = topo.width

    # leaf data + leaf boxes: tight clipped reference boxes at build time,
    # full-triangle unions otherwise
    safe_orig = np.clip(topo.orig, 0, len(tri_verts) - 1)
    v = tri_verts[safe_orig]  # [L, cap, 3, 3]
    if use_clip and topo.clip_lo is not None:
        occ3 = topo.in_range[:, :, None]
        vlo = np.where(occ3, topo.clip_lo, np.inf).min(axis=1)
        vhi = np.where(occ3, topo.clip_hi, -np.inf).max(axis=1)
    else:
        occ = topo.in_range[:, :, None, None]
        vlo = np.where(occ, v, np.inf).min(axis=(1, 2))  # [L, 3]
        vhi = np.where(occ, v, -np.inf).max(axis=(1, 2))
    leaf_lo = np.where(np.isfinite(vlo), vlo, 0.0).astype(np.float32)
    leaf_hi = np.where(np.isfinite(vhi), vhi, 0.0).astype(np.float32)

    # child slot boxes: internal slots from the binary refit, leaf slots
    # from their bins, empty slots zero
    is_int = topo.int_ids >= 0
    is_leaf_slot = topo.ptr <= -2
    leaf_ids = np.where(is_leaf_slot, -2 - topo.ptr, 0)
    box_lo = np.zeros((W_n, w, 3), np.float32)
    box_hi = np.zeros((W_n, w, 3), np.float32)
    box_lo[is_int] = b_min[np.clip(topo.int_ids, 0, len(b_min) - 1)][is_int]
    box_hi[is_int] = b_max[np.clip(topo.int_ids, 0, len(b_max) - 1)][is_int]
    box_lo[is_leaf_slot] = leaf_lo[leaf_ids[is_leaf_slot]]
    box_hi[is_leaf_slot] = leaf_hi[leaf_ids[is_leaf_slot]]

    nodes = np.zeros((W_n, _node_row_len(w)), np.float32)
    nodes[:, 0:3 * w] = box_lo.transpose(0, 2, 1).reshape(W_n, 3 * w)
    nodes[:, 3 * w:6 * w] = box_hi.transpose(0, 2, 1).reshape(W_n, 3 * w)
    nodes[:, 6 * w:7 * w] = topo.ptr.astype(np.float32)
    nodes[:, 7 * w] = topo.node_axis.astype(np.float32)

    leaves = np.zeros((max(L, 1), _leaf_row_len(cap)), np.float32)
    leaves[:, 9 * cap:10 * cap] = -1.0
    if L:
        data = np.zeros((L, 9, cap), np.float32)
        data[:, 0:3] = v[:, :, 0].transpose(0, 2, 1)
        data[:, 3:6] = (v[:, :, 1] - v[:, :, 0]).transpose(0, 2, 1)
        data[:, 6:9] = (v[:, :, 2] - v[:, :, 0]).transpose(0, 2, 1)
        # zero padding slots so degenerate tris never hit
        data *= topo.in_range[:, None, :]
        leaves[:, 0:9 * cap] = data.reshape(L, 9 * cap)
        leaves[:, 9 * cap:10 * cap] = np.where(
            topo.in_range, topo.orig, -1
        ).astype(np.float32)
    # multi-row records are shaped [n, rows, 128]: Mosaic accepts a
    # single-record DMA slice .at[i] -> (rows, 128) from HBM, while a
    # (1, 256) slice of a flat [n, 256] array violates its (8, 128)
    # tile alignment (probed on hardware, round 4)
    if nodes.shape[1] > 128:
        nodes = nodes.reshape(W_n, -1, 128)
    if leaves.shape[1] > 128:
        leaves = leaves.reshape(len(leaves), -1, 128)
    return nodes, leaves


def plan_treelets(ptr: np.ndarray, max_rows: int | None = None) -> np.ndarray:
    """Partition the wide tree into subtree "treelets" for the scheduled
    traversal (accel/treelet.py): walk down from the root, cutting a
    treelet wherever a subtree's total row count (its node rows + leaf
    rows) drops to `max_rows`. Leaf children hanging above any cut become
    singleton leaf treelets. Returns ptr-encoded roots covering every
    node/leaf exactly once.

    Pure scheduling metadata: the traversal kernels still address the
    global node/leaf arrays; treelets only bound each ray block's working
    set. max_rows defaults to ~1/128 of the tree (K of order 100-300)."""
    W = len(ptr)
    is_leaf_slot = ptr <= -2
    is_int_slot = ptr >= 0
    cost = 1 + is_leaf_slot.sum(axis=1).astype(np.int64)
    # children always have larger wide ids than their parent (BFS layout),
    # so a single reverse sweep accumulates subtree costs bottom-up
    child = np.clip(ptr, 0, W - 1)
    for r in range(W - 1, -1, -1):
        js = np.nonzero(is_int_slot[r])[0]
        if len(js):
            cost[r] += cost[child[r, js]].sum()
    total = int(cost[0])
    if max_rows is None:
        max_rows = max(384, total // 128)
    roots: list[int] = []
    stack = [0]
    while stack:
        r = stack.pop()
        if r <= -2 or cost[r] <= max_rows:
            roots.append(r)
            continue
        for j in range(ptr.shape[1]):
            c = int(ptr[r, j])
            if c != -1:
                stack.append(c)
    return np.asarray(roots, np.int64)


def _treelet_boxes(roots: np.ndarray, nodes: np.ndarray,
                   leaves: np.ndarray, w: int = WIDTH,
                   cap: int = LEAF_CAP
                   ) -> tuple[np.ndarray, np.ndarray]:
    """AABB per treelet root, from the assembled rows: a node treelet's box
    is the union of its row's occupied child-slot boxes; a leaf treelet's
    box bounds its triangles. Recomputed on every refit (geometry moves)."""
    nodes = nodes.reshape(len(nodes), -1)
    leaves = leaves.reshape(len(leaves), -1)
    K = len(roots)
    lo = np.zeros((K, 3), np.float32)
    hi = np.full((K, 3), -1.0, np.float32)  # inverted box: never hit
    is_node = roots >= 0
    if is_node.any():
        rows = nodes[roots[is_node].astype(np.int64)]
        slot_lo = rows[:, 0:3 * w].reshape(-1, 3, w)
        slot_hi = rows[:, 3 * w:6 * w].reshape(-1, 3, w)
        used = (rows[:, 6 * w:7 * w] != -1.0)[:, None, :]
        nlo = np.where(used, slot_lo, np.inf).min(axis=2)
        nhi = np.where(used, slot_hi, -np.inf).max(axis=2)
        ok = np.isfinite(nlo).all(axis=1, keepdims=True)
        lo[is_node] = np.where(ok, nlo, 0.0)
        hi[is_node] = np.where(ok, nhi, -1.0)
    is_leaf = ~is_node
    if is_leaf.any():
        lrows = leaves[(-2 - roots[is_leaf]).astype(np.int64)]
        data = lrows[:, 0:9 * cap].reshape(-1, 9, cap)
        v0 = data[:, 0:3]
        pts = np.stack([v0, v0 + data[:, 3:6], v0 + data[:, 6:9]], axis=0)
        occ = (lrows[:, 9 * cap:10 * cap] >= 0.0)[None, :, None, :]
        occ = np.broadcast_to(occ, pts.shape)
        llo = np.where(occ, pts, np.inf).min(axis=(0, 3))
        lhi = np.where(occ, pts, -np.inf).max(axis=(0, 3))
        ok = np.isfinite(llo).all(axis=1, keepdims=True)
        lo[is_leaf] = np.where(ok, llo, 0.0)
        hi[is_leaf] = np.where(ok, lhi, -1.0)
    return lo, hi


def refit_wide(topo: WideTopology, b_min: np.ndarray, b_max: np.ndarray,
               tri_verts: np.ndarray, use_clip: bool = False) -> WideBVH:
    """Rebuild wide rows for moved geometry without touching topology.
    `b_min`/`b_max` come from a binary refit (lbvh.refit_host); shapes are
    identical to the original build, so jitted traces are reused verbatim.
    use_clip is only set by build_wide; motion refits keep the default
    (full-triangle leaf boxes — stale clip boxes could uncover geometry)."""
    tri_verts = np.asarray(tri_verts, np.float32)
    nodes, leaves = assemble_rows(topo, b_min, b_max, tri_verts, use_clip)
    bounds = np.stack(
        [tri_verts.min(axis=(0, 1)), tri_verts.max(axis=(0, 1))]
    ).astype(np.float32)
    t_lo, t_hi = _treelet_boxes(topo.treelet_roots, nodes, leaves,
                                topo.width, topo.leaf_cap)
    return WideBVH(
        nodes=jnp.asarray(nodes),
        leaves=jnp.asarray(leaves),
        bounds=jnp.asarray(bounds),
        depth_token=jnp.zeros((topo.n_levels,), jnp.uint8),
        t_roots=jnp.asarray(topo.treelet_roots.astype(np.int32)),
        t_lo=jnp.asarray(t_lo),
        t_hi=jnp.asarray(t_hi),
        width_token=jnp.zeros((topo.width,), jnp.uint8),
        num_nodes=len(nodes),
        num_leaves=len(leaves),
        num_tris=len(tri_verts),
        leaf_token=jnp.zeros((topo.leaf_cap,), jnp.uint8),
    )


class WideBVH(NamedTuple):
    """Node/leaf records are single aligned rows (128 or 256 f32 — the
    TPU's HBM minor-dim tile is 128 lanes, so 512 B is the storage/DMA
    granule and a 256-word row is one (256,) DMA) so one copy fetches a
    whole visit. With w = width and S = leaf_slots:

      nodes[m]:  cols c*w+j (c<6) = child-box component c of slot j
                 (lox,loy,loz,hix,hiy,hiz); cols 6w+j = child pointer,
                 f32-encoded (>= 0 wide node, -1 empty, <= -2 leaf ~ptr);
                 col 7w = dominant child-sort axis
      leaves[l]: cols c*S+j (c<9) = triangle component c of slot j
                 (v0,e1,e2); cols 9S+j = original tri id (f32, -1 empty)

    f32 encoding of ids is exact below 2^24 — a 16M-triangle/node cap.
    """

    nodes: jnp.ndarray  # [M, 128] f32
    leaves: jnp.ndarray  # [L, 128] f32
    bounds: jnp.ndarray  # [2, 3] f32 scene AABB (for ray-sort keys)
    # [depth] u8 zeros: the wide tree's level count, encoded in a *shape*
    # so traversal dispatch can branch on it statically under jit (pytree
    # int leaves become tracers; shapes stay concrete). Worst-case stack
    # occupancy is (WIDTH-1)*depth + 1 (each visit pops one entry and
    # pushes at most WIDTH children).
    depth_token: jnp.ndarray
    # treelet schedule (accel/treelet.py): ptr-encoded subtree roots that
    # tile the tree, plus their AABBs. K is shape-encoded (static).
    t_roots: jnp.ndarray  # [K] i32
    t_lo: jnp.ndarray  # [K, 3] f32
    t_hi: jnp.ndarray  # [K, 3] f32
    # [width] u8 zeros: internal-node arity (8 or 16), shape-encoded like
    # depth_token so traversal kernels specialize statically under jit
    width_token: jnp.ndarray
    num_nodes: int
    num_leaves: int
    num_tris: int
    # [leaf_slots] u8 zeros: triangle slots per leaf row (8/12/16/24),
    # shape-encoded like width_token. Trailing None default keeps
    # pre-round-4 call sites (which always meant 8) valid without
    # allocating a device array at import time.
    leaf_token: jnp.ndarray | None = None

    @property
    def max_depth(self) -> int:
        return self.depth_token.shape[0]

    @property
    def width(self) -> int:
        return self.width_token.shape[0]

    @property
    def leaf_slots(self) -> int:
        return LEAF_CAP if self.leaf_token is None else self.leaf_token.shape[0]

    @property
    def max_stack(self) -> int:
        return (self.width - 1) * self.max_depth + 1


def build_wide(tri_verts: np.ndarray, binary: lbvh.BVH | None = None,
               leaf_cap: int = LEAF_CAP, with_topology: bool = False,
               width: int = WIDTH, clip_sorted=None):
    """tri_verts: [T, 3, 3] world space. leaf_cap bounds triangles per fat
    leaf row (<= 12 in a 128-word row, <= 24 in a 256-word row; unused
    slots are zeroed). width = children per internal node (8/16 in a
    128-word row, 24/32 in a 256-word row).
    clip_sorted: optional (clip_lo, clip_hi) [R, 3] arrays aligned with
    the binary build's sorted order (spatial-split reference boxes from
    lbvh.build_sah(refs=...)); leaf-bin boxes then come from these.
    with_topology=True also returns the WideTopology for later refits."""
    assert 1 <= leaf_cap <= 24
    assert width in (8, 16, 24, 32)
    tri_verts = np.asarray(tri_verts, np.float32)
    T = len(tri_verts)
    if binary is None:
        binary = lbvh.build(tri_verts, leaf_size=min(4, leaf_cap),
                            pad_nodes_to_pow2=False, as_numpy=True)

    b_left = np.asarray(binary.left).astype(np.int64)
    b_count = np.asarray(binary.count).astype(np.int64)
    b_escape = np.asarray(binary.escape).astype(np.int64)
    b_min = np.asarray(binary.aabb_min)
    b_max = np.asarray(binary.aabb_max)
    order = np.asarray(binary.tri_order).astype(np.int64)

    M = binary.num_nodes
    is_leaf = b_count > 0
    li_all = np.clip(b_left, 0, M - 1)  # left child (internal nodes)
    ri_all = np.clip(b_escape[li_all], 0, M - 1)  # right = escape(left)

    # triangle count + sorted-range start per binary node, bottom-up in
    # depth-bounded passes (64-bit build keys bound the depth)
    counts = np.where(is_leaf, b_count, 0)
    starts = np.where(is_leaf, b_left, -1)  # leaf: offset into sorted order
    for _ in range(70):
        ready = ~is_leaf & (counts == 0)
        if not ready.any():
            break
        ok = ready & (counts[li_all] > 0) & (counts[ri_all] > 0)
        counts[ok] = (counts[li_all] + counts[ri_all])[ok]
        starts[ok] = np.minimum(starts[li_all], starts[ri_all])[ok]
    assert (counts > 0).all(), "wide-BVH count propagation failed"

    # --- breadth-first expansion over flat frontiers ---
    # slots[f, j] = binary node id or -1
    EMPTY = np.int64(-1)
    frontier = np.asarray([[0] + [-1] * (width - 1)], np.int64)

    all_rows = []  # (slots [F,8]) per level

    while len(frontier):
        slots = frontier.copy()
        # expand: repeatedly split the largest splittable slot per row
        for _ in range(width - 1):
            valid = slots >= 0
            cnt = np.where(valid, counts[np.clip(slots, 0, M - 1)], -1)
            splittable = valid & ~is_leaf[np.clip(slots, 0, M - 1)] & (cnt > leaf_cap)
            has_free = (~valid).sum(axis=1) > 0
            cand = np.where(splittable, cnt, -1)
            best = cand.argmax(axis=1)
            rows = np.nonzero(has_free & (cand[np.arange(len(slots)), best] > 0))[0]
            if len(rows) == 0:
                break
            bcol = best[rows]
            node = slots[rows, bcol]
            lchild = li_all[node]
            rchild = ri_all[node]
            # left replaces the slot; right goes into the first free slot
            slots[rows, bcol] = lchild
            free_col = np.argmin(slots[rows] >= 0, axis=1)  # first False
            slots[rows, free_col] = rchild
        # rows with a single internal child > LEAF_CAP that couldn't split
        # (full slots) are fine: that child becomes a child wide node.
        all_rows.append(slots)
        # children that stay internal (count > LEAF_CAP) spawn next frontier
        valid = slots >= 0
        child_internal = valid & (counts[np.clip(slots, 0, M - 1)] > leaf_cap)
        next_nodes = slots[child_internal]
        frontier = (
            np.concatenate(
                [next_nodes[:, None],
                 np.full((len(next_nodes), width - 1), EMPTY)], axis=1
            )
            if len(next_nodes)
            else np.zeros((0, width), np.int64)
        )

    slots_all = np.concatenate(all_rows, axis=0)  # [W, 8] binary ids
    W = len(slots_all)
    valid = slots_all >= 0
    sl = np.clip(slots_all, 0, M - 1)
    child_internal = valid & (counts[sl] > leaf_cap)
    child_leaf = valid & ~child_internal

    # wide-node ids for internal children: they are exactly the next-level
    # frontier rows, laid out in row-major traversal order of child_internal
    internal_order = np.cumsum(child_internal.reshape(-1)) - 1
    internal_order = internal_order.reshape(W, width)
    level_sizes = [len(r) for r in all_rows]
    level_of_row = np.repeat(np.arange(len(all_rows)), level_sizes)
    next_base = np.cumsum(level_sizes)
    int_before = np.zeros(len(all_rows) + 1, np.int64)
    row_starts = np.cumsum([0] + level_sizes)
    for k in range(len(all_rows)):
        int_before[k + 1] = int_before[k] + child_internal[
            row_starts[k] : row_starts[k + 1]
        ].sum()
    child_wide_id = (
        next_base[level_of_row][:, None]
        + internal_order
        - int_before[level_of_row][:, None]
    )

    assert W < (1 << 24) and T < (1 << 24), "f32 id encoding cap exceeded"

    # --- leaf-bin packing: group each node's leaf children into bins of
    # up to leaf_cap triangles (first-fit decreasing). The traversal
    # kernel intersects all 8 slots of every leaf row it visits, so
    # near-full rows directly cut leaf ALU (~1.5x on median scenes). A
    # bin's triangles need not be a contiguous binary range — leaf boxes
    # are computed from the triangles themselves in assemble_rows. ---
    int_ids = np.full((W, width), -1, np.int64)
    ptr = np.full((W, width), -1, np.int64)
    orig_rows: list[np.ndarray] = []
    pos_rows: list[np.ndarray] = []  # sorted positions (for clip boxes)
    cent = np.zeros((W, width, 3), np.float64)
    with np.errstate(invalid="ignore"):
        # padded binary nodes carry +/-inf boxes; their centroids are
        # never read (they back no slot)
        b_cent = np.nan_to_num((b_min + b_max) * 0.5,
                               posinf=0.0, neginf=0.0)
    tri_cent_lo = None  # lazy per-bin centroid source

    for r in range(W):
        col = 0
        for j in range(width):
            if child_internal[r, j]:
                int_ids[r, col] = slots_all[r, j]
                ptr[r, col] = child_wide_id[r, j]
                cent[r, col] = b_cent[slots_all[r, j]]
                col += 1
        js = [j for j in range(width) if child_leaf[r, j]]
        if js:
            items = sorted(js, key=lambda j: -counts[slots_all[r, j]])
            bins: list[list[int]] = []
            bin_counts: list[int] = []
            for j in items:
                c = int(counts[slots_all[r, j]])
                for bi in range(len(bins)):
                    if bin_counts[bi] + c <= leaf_cap:
                        bins[bi].append(j)
                        bin_counts[bi] += c
                        break
                else:
                    bins.append([j])
                    bin_counts.append(c)
            for members in bins:
                tri_ids = np.concatenate([
                    order[starts[slots_all[r, j]]:
                          starts[slots_all[r, j]] + counts[slots_all[r, j]]]
                    for j in members
                ])
                orig_rows.append(tri_ids)
                if clip_sorted is not None:
                    pos_rows.append(np.concatenate([
                        np.arange(starts[slots_all[r, j]],
                                  starts[slots_all[r, j]]
                                  + counts[slots_all[r, j]])
                        for j in members
                    ]))
                ptr[r, col] = -2 - (len(orig_rows) - 1)
                # bin centroid = mean of member binary-node centroids
                cent[r, col] = b_cent[
                    [slots_all[r, j] for j in members]
                ].mean(axis=0)
                col += 1

    n_leaves = len(orig_rows)
    orig = np.full((max(n_leaves, 1), leaf_cap), -1, np.int64)
    in_range = np.zeros((max(n_leaves, 1), leaf_cap), bool)
    for i, ids in enumerate(orig_rows):
        orig[i, : len(ids)] = ids
        in_range[i, : len(ids)] = True
    orig = np.clip(orig, 0, max(T - 1, 0))  # padding indexes row 0 safely

    clip_lo = clip_hi = None
    if clip_sorted is not None:
        cl_s, ch_s = clip_sorted
        clip_lo = np.zeros((max(n_leaves, 1), leaf_cap, 3), np.float32)
        clip_hi = np.zeros_like(clip_lo)
        for i, pos in enumerate(pos_rows):
            clip_lo[i, : len(pos)] = cl_s[pos]
            clip_hi[i, : len(pos)] = ch_s[pos]

    # ordered traversal: sort each node's child slots ascending by centroid
    # along the node's dominant (max centroid spread) axis, and record that
    # axis in col 56. The traversal kernel pushes slots in direction-aware
    # order (far first, near last) so near children pop first and the
    # per-lane t-prune culls far subtrees — the packet analogue of the
    # hardware BVH's ordered traversal.
    slot_used = ptr != -1
    cmin = np.where(slot_used[:, :, None], cent, np.inf).min(axis=1)
    cmax = np.where(slot_used[:, :, None], cent, -np.inf).max(axis=1)
    spread = np.where(np.isfinite(cmin) & np.isfinite(cmax), cmax - cmin, 0.0)
    node_axis = spread.argmax(axis=1)  # [W]
    key = np.where(
        slot_used,
        np.take_along_axis(cent, node_axis[:, None, None], axis=2)[..., 0],
        np.inf,
    )
    slot_order = np.argsort(key, axis=1, kind="stable")  # [W, 8]
    int_ids = np.take_along_axis(int_ids, slot_order, axis=1)
    ptr = np.take_along_axis(ptr, slot_order, axis=1)

    topo = WideTopology(
        int_ids=int_ids, ptr=ptr, node_axis=node_axis,
        orig=orig, in_range=in_range,
        n_levels=max(len(all_rows), 1), leaf_cap=leaf_cap,
        treelet_roots=plan_treelets(ptr), width=width,
        clip_lo=clip_lo, clip_hi=clip_hi,
    )
    wbvh = refit_wide(topo, b_min, b_max, tri_verts,
                      use_clip=clip_sorted is not None)
    return (wbvh, topo) if with_topology else wbvh
