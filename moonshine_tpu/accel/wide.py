"""8-wide BVH for packet traversal.

Collapses the binary Karras tree (lbvh.py) into 8-ary nodes: each wide node
repeatedly expands its largest-count binary child until it has up to 8
children; children covering <= 8 triangles become fat leaves holding fully
unpacked triangle data (v0, e1, e2 per slot) so the traversal kernel never
chases a vertex indirection.

Layout is chosen for the Pallas packet kernel (packet.py): a ray *block*
shares one traversal stack, so node/leaf fetches are scalar-indexed rows —
no per-lane gathers anywhere:

  boxes  [M, 6, 8]  f32  child AABBs, component-major
                         (lox,loy,loz,hix,hiy,hiz) x child slot
  ptr    [M, 8]     i32  >= 0: wide-node index; -1: empty slot;
                         <= -2: leaf index = -2 - ptr
  tris   [L, 9, 8]  f32  leaf triangles, component-major
                         (v0x,v0y,v0z,e1x,e1y,e1z,e2x,e2y,e2z) x tri slot
  ids    [L, 8]     i32  original triangle index, -1 for empty slots
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import lbvh

LEAF_CAP = 8
WIDTH = 8


class WideBVH(NamedTuple):
    boxes: jnp.ndarray  # [M, 6, 8] f32
    ptr: jnp.ndarray  # [M, 8] i32
    tris: jnp.ndarray  # [L, 9, 8] f32
    ids: jnp.ndarray  # [L, 8] i32
    num_nodes: int
    num_leaves: int
    num_tris: int


def build_wide(tri_verts: np.ndarray, binary: lbvh.BVH | None = None) -> WideBVH:
    """tri_verts: [T, 3, 3] world space."""
    tri_verts = np.asarray(tri_verts, np.float32)
    if binary is None:
        binary = lbvh.build(tri_verts, leaf_size=4, pad_nodes_to_pow2=False)

    b_left = np.asarray(binary.left)
    b_count = np.asarray(binary.count)
    b_escape = np.asarray(binary.escape)
    b_min = np.asarray(binary.aabb_min)
    b_max = np.asarray(binary.aabb_max)
    order = np.asarray(binary.tri_order)

    def bin_children(i):
        l = b_left[i]
        r = b_escape[l]
        return int(l), int(r)

    # triangle count per binary node, bottom-up in depth-bounded passes
    M = binary.num_nodes
    is_leaf = b_count > 0
    internal = ~is_leaf
    counts_memo = np.where(is_leaf, b_count, 0).astype(np.int64)
    li_all = np.clip(b_left, 0, M - 1)
    ri_all = np.clip(b_escape[li_all], 0, M - 1)
    for _ in range(70):
        ready = internal & (counts_memo == 0)
        if not ready.any():
            break
        child_sum = counts_memo[li_all] + counts_memo[ri_all]
        upd = ready & (counts_memo[li_all] > 0) & (counts_memo[ri_all] > 0)
        counts_memo[upd] = child_sum[upd]
    assert (counts_memo > 0).all(), "wide-BVH count propagation failed"

    boxes_out: list[np.ndarray] = []
    ptr_out: list[np.ndarray] = []
    leaf_tris: list[np.ndarray] = []
    leaf_ids: list[np.ndarray] = []

    def make_leaf(bin_node: int) -> int:
        """Collect the (<= LEAF_CAP) triangles under a binary node."""
        tris = []
        stack = [bin_node]
        while stack:
            n = stack.pop()
            if b_count[n] > 0:
                for k in range(b_count[n]):
                    tris.append(int(order[b_left[n] + k]))
            else:
                l, r = bin_children(n)
                stack += [l, r]
        assert len(tris) <= LEAF_CAP
        data = np.zeros((9, WIDTH), np.float32)
        ids = np.full(WIDTH, -1, np.int32)
        for j, t in enumerate(tris):
            v = tri_verts[t]
            data[0:3, j] = v[0]
            data[3:6, j] = v[1] - v[0]
            data[6:9, j] = v[2] - v[0]
            ids[j] = t
        leaf_tris.append(data)
        leaf_ids.append(ids)
        return len(leaf_tris) - 1

    def node_box(i):
        return b_min[i], b_max[i]

    def make_wide(bin_node: int) -> int:
        """Convert the subtree at a binary node into a wide node; returns
        its index (reserved before recursion so the root is node 0)."""
        my_idx = len(ptr_out)
        boxes_out.append(np.zeros((6, WIDTH), np.float32))
        ptr_out.append(np.full(WIDTH, -1, np.int32))

        # expand: replace the child with the most triangles by its two
        # binary children until we have 8 or no internal node can split
        children = [bin_node]
        while len(children) < WIDTH:
            best, best_n = -1, -1
            for ci, c in enumerate(children):
                if b_count[c] == 0 and counts_memo[c] > LEAF_CAP:
                    if counts_memo[c] > best_n:
                        best, best_n = ci, counts_memo[c]
            if best < 0:
                # all children fit leaves; if only one child and it's
                # internal, still split once to avoid 1-child nodes
                if len(children) == 1 and b_count[children[0]] == 0:
                    l, r = bin_children(children[0])
                    children = [l, r]
                    continue
                break
            l, r = bin_children(children[best])
            children[best : best + 1] = [l, r]

        for j, c in enumerate(children):
            lo, hi = node_box(c)
            boxes_out[my_idx][0:3, j] = lo
            boxes_out[my_idx][3:6, j] = hi
            if counts_memo[c] <= LEAF_CAP:
                ptr_out[my_idx][j] = -2 - make_leaf(c)
            else:
                ptr_out[my_idx][j] = make_wide(c)
        return my_idx

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        make_wide(0)
    finally:
        sys.setrecursionlimit(old_limit)

    return WideBVH(
        boxes=jnp.asarray(np.stack(boxes_out)),
        ptr=jnp.asarray(np.stack(ptr_out)),
        tris=jnp.asarray(np.stack(leaf_tris)),
        ids=jnp.asarray(np.stack(leaf_ids)),
        num_nodes=len(ptr_out),
        num_leaves=len(leaf_tris),
        num_tris=len(tri_verts),
    )
