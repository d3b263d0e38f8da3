"""Treelet-scheduled traversal (accel/treelet.py) vs the brute-force
oracle and the monolithic packet kernels (interpret mode on CPU; the same
kernel compiles natively on TPU — scripts/validate_tpu.py covers that)."""

import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.accel import packet, traverse, treelet, wide

from test_bvh import random_rays, random_tris


def oracle(tris, o, d, t_max=1e12):
    return traverse.brute_force_closest(jnp.asarray(tris), o, d, t_max)


def build(n_tris, seed, max_rows=48):
    tris = random_tris(n_tris, seed=seed)
    w, topo = wide.build_wide(tris, with_topology=True)
    # force a many-treelet partition at test scale
    roots = wide.plan_treelets(topo.ptr, max_rows=max_rows)
    lo, hi = wide._treelet_boxes(
        roots, np.asarray(w.nodes), np.asarray(w.leaves)
    )
    w = w._replace(
        t_roots=jnp.asarray(roots.astype(np.int32)),
        t_lo=jnp.asarray(lo),
        t_hi=jnp.asarray(hi),
    )
    return tris, w


class TestPlan:
    def test_roots_cover_all_leaves_once(self):
        tris, w = build(1500, seed=3)
        ptr = np.asarray(w.nodes[:, 48:56]).astype(np.int64)
        seen = np.zeros(w.num_leaves, bool)
        stack = [int(r) for r in np.asarray(w.t_roots)]
        while stack:
            p = stack.pop()
            if p <= -2:
                assert not seen[-2 - p]
                seen[-2 - p] = True
                continue
            for c in ptr[p]:
                if c != -1:
                    stack.append(int(c))
        assert seen.all()

    def test_boxes_bound_content(self):
        tris, w = build(800, seed=4)
        ptr = np.asarray(w.nodes[:, 48:56]).astype(np.int64)
        leaves = np.asarray(w.leaves)
        lo = np.asarray(w.t_lo)
        hi = np.asarray(w.t_hi)
        for k, r in enumerate(np.asarray(w.t_roots)):
            stack = [int(r)]
            while stack:
                p = stack.pop()
                if p <= -2:
                    row = leaves[-2 - p]
                    occ = row[72:80] >= 0
                    data = row[0:72].reshape(9, 8)
                    v0 = data[0:3].T
                    pts = np.concatenate(
                        [v0, v0 + data[3:6].T, v0 + data[6:9].T]
                    )
                    occ3 = np.concatenate([occ, occ, occ])
                    if occ3.any():
                        assert (pts[occ3] >= lo[k] - 1e-4).all()
                        assert (pts[occ3] <= hi[k] + 1e-4).all()
                    continue
                for c in ptr[p]:
                    if c != -1:
                        stack.append(int(c))


class TestTreeletTraversal:
    def test_closest_matches_oracle(self):
        tris, w = build(900, seed=5)
        o, d = random_rays(512, seed=6)
        ref = oracle(tris, o, d)
        got = treelet.closest_hit_treelet(w, o, d, 1e12, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
        np.testing.assert_allclose(
            np.asarray(got.t), np.asarray(ref.t), rtol=1e-4, atol=1e-4
        )

    def test_closest_matches_packet(self):
        tris, w = build(1200, seed=7)
        o, d = random_rays(700, seed=8)
        ref = packet.closest_hit_packet(w, o, d, 1e12, interpret=True)
        got = treelet.closest_hit_treelet(w, o, d, 1e12, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))

    def test_active_mask_and_tmax_vector(self):
        tris, w = build(600, seed=9)
        o, d = random_rays(300, seed=10)
        ref = oracle(tris, o, d)
        hit_t = np.asarray(ref.t)
        # per-ray tmax cutting half the hits off
        t_max = jnp.asarray(np.where(hit_t < 4.0, hit_t * 0.5, 1e12),
                            jnp.float32)
        active = jnp.asarray(np.arange(300) % 3 != 0)
        got = treelet.closest_hit_treelet(w, o, d, t_max, active_in=active,
                                          interpret=True)
        ref2 = packet.closest_hit_packet(w, o, d, t_max, active_in=active,
                                         interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got.tri), np.asarray(ref2.tri)
        )

    def test_any_hit_matches_packet(self):
        tris, w = build(900, seed=11)
        o, d = random_rays(640, seed=12)
        ref = packet.any_hit_packet(w, o, d, 20.0, interpret=True)
        got = treelet.any_hit_treelet(w, o, d, 20.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_any_hit_active_mask(self):
        tris, w = build(500, seed=13)
        o, d = random_rays(256, seed=14)
        active = jnp.asarray(np.arange(256) % 2 == 0)
        ref = packet.any_hit_packet(w, o, d, 30.0, active_in=active,
                                    interpret=True)
        got = treelet.any_hit_treelet(w, o, d, 30.0, active_in=active,
                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_single_treelet_tree(self):
        """A tree small enough that the plan is one root treelet."""
        tris = random_tris(40, seed=15)
        w = wide.build_wide(tris)
        assert np.asarray(w.t_roots).tolist() == [0]
        o, d = random_rays(128, seed=16)
        ref = oracle(tris, o, d)
        got = treelet.closest_hit_treelet(w, o, d, 1e12, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got.tri), np.asarray(ref.tri)
        )
