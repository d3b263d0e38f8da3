"""LBVH build + traversal correctness against a brute-force intersector."""

import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.accel import lbvh, traverse


def random_tris(n, seed=0, spread=4.0):
    rs = np.random.RandomState(seed)
    centers = rs.randn(n, 1, 3) * spread
    tris = centers + rs.randn(n, 3, 3) * 0.5
    return tris.astype(np.float32)


def random_rays(n, seed=1, spread=6.0):
    rs = np.random.RandomState(seed)
    o = rs.randn(n, 3).astype(np.float32) * spread
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def assert_matches_brute_force(tris, n_rays=256, seed=1):
    bvh = lbvh.build(tris)
    sorted_verts = jnp.asarray(tris)[bvh.tri_order]
    o, d = random_rays(n_rays, seed)
    got = traverse.closest_hit(bvh, sorted_verts, o, d, 1e12)
    want = traverse.brute_force_closest(jnp.asarray(tris), o, d, 1e12)
    np.testing.assert_array_equal(np.asarray(got.is_hit), np.asarray(want.is_hit))
    hit = np.asarray(want.is_hit)
    # same nearest t (tri index may differ on exact ties)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )
    same_tri = np.asarray(got.tri)[hit] == np.asarray(want.tri)[hit]
    assert same_tri.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.u)[hit][same_tri],
        np.asarray(want.u)[hit][same_tri],
        atol=1e-4,
    )
    return bvh


class TestBuild:
    def test_structure_invariants(self):
        tris = random_tris(500)
        bvh = lbvh.build(tris)
        left = np.asarray(bvh.left)
        count = np.asarray(bvh.count)
        escape = np.asarray(bvh.escape)
        M = bvh.num_nodes
        internal = count[:M] == 0
        # children in range, escape in range or sentinel
        assert (left[:M][internal] > 0).all() and (left[:M][internal] < M).all()
        assert ((escape[:M] >= -1) & (escape[:M] < M)).all()
        # leaves cover every triangle exactly once
        covered = np.zeros(bvh.num_tris, np.int32)
        for i in range(M):
            if count[i] > 0:
                covered[left[i] : left[i] + count[i]] += 1
        assert (covered == 1).all()

    def test_parent_aabbs_contain_children(self):
        tris = random_tris(300, seed=7)
        bvh = lbvh.build(tris)
        amin, amax = np.asarray(bvh.aabb_min), np.asarray(bvh.aabb_max)
        count = np.asarray(bvh.count)
        left = np.asarray(bvh.left)
        escape = np.asarray(bvh.escape)
        for i in range(bvh.num_nodes):
            if count[i] == 0:
                l = left[i]
                r = escape[l]
                for c in (l, r):
                    assert (amin[i] <= amin[c] + 1e-6).all()
                    assert (amax[i] >= amax[c] - 1e-6).all()

    def test_single_triangle(self):
        tris = random_tris(1)
        bvh = lbvh.build(tris)
        assert bvh.num_nodes == 1
        assert int(bvh.count[0]) == 1

    def test_coincident_triangles(self):
        # all centroids identical: exercises the index-tiebreak key path
        tri = random_tris(1)
        tris = np.repeat(tri, 64, axis=0)
        bvh = lbvh.build(tris)
        o = jnp.asarray([[0.0, 0.0, -100.0]] , jnp.float32)
        centroid = tri[0].mean(0)
        d = jnp.asarray((centroid - np.asarray(o[0])) / np.linalg.norm(centroid - np.asarray(o[0])), jnp.float32)[None]
        sorted_verts = jnp.asarray(tris)[bvh.tri_order]
        got = traverse.closest_hit(bvh, sorted_verts, o, d, 1e12)
        assert bool(got.is_hit[0])


class TestTraversal:
    def test_matches_brute_force_small(self):
        assert_matches_brute_force(random_tris(37, seed=2))

    def test_matches_brute_force_medium(self):
        assert_matches_brute_force(random_tris(2000, seed=3))

    def test_clustered_geometry(self):
        # two distant clusters: exercises skip links hard
        a = random_tris(200, seed=4, spread=1.0)
        b = random_tris(200, seed=5, spread=1.0) + np.float32([100, 0, 0])
        assert_matches_brute_force(np.concatenate([a, b]))

    def test_any_hit_consistent_with_closest(self):
        tris = random_tris(500, seed=6)
        bvh = lbvh.build(tris)
        sorted_verts = jnp.asarray(tris)[bvh.tri_order]
        o, d = random_rays(512, seed=7)
        closest = traverse.closest_hit(bvh, sorted_verts, o, d, 1e12)
        shadowed = traverse.any_hit(bvh, sorted_verts, o, d, 1e12)
        np.testing.assert_array_equal(
            np.asarray(shadowed), np.asarray(closest.is_hit)
        )

    def test_any_hit_respects_tmax(self):
        tris = random_tris(200, seed=8)
        bvh = lbvh.build(tris)
        sorted_verts = jnp.asarray(tris)[bvh.tri_order]
        o, d = random_rays(256, seed=9)
        closest = traverse.closest_hit(bvh, sorted_verts, o, d, 1e12)
        # tmax just below the closest hit -> unoccluded
        eps = 1e-3
        shadowed = traverse.any_hit(
            bvh, sorted_verts, o, d, jnp.maximum(closest.t * (1 - eps), 0.0)
        )
        hit = np.asarray(closest.is_hit)
        assert not np.asarray(shadowed)[hit].any()

    def test_inactive_lanes_stay_missed(self):
        tris = random_tris(100, seed=10)
        bvh = lbvh.build(tris)
        sorted_verts = jnp.asarray(tris)[bvh.tri_order]
        o, d = random_rays(64, seed=11)
        active = jnp.arange(64) % 2 == 0
        got = traverse.closest_hit(bvh, sorted_verts, o, d, 1e12, active_in=active)
        assert not np.asarray(got.is_hit)[1::2].any()


class TestRefit:
    def test_refit_matches_rebuild_boxes(self):
        tris = random_tris(400, seed=12)
        bvh = lbvh.build(tris)
        moved = tris + np.float32([0.3, -0.2, 0.1]) + 0.05 * np.sin(tris)
        refitted = lbvh.refit(bvh, jnp.asarray(moved))
        # traversal over refitted tree must match brute force on moved tris
        sorted_verts = jnp.asarray(moved)[refitted.tri_order]
        o, d = random_rays(256, seed=13)
        got = traverse.closest_hit(refitted, sorted_verts, o, d, 1e12)
        want = traverse.brute_force_closest(jnp.asarray(moved), o, d, 1e12)
        np.testing.assert_array_equal(
            np.asarray(got.is_hit), np.asarray(want.is_hit)
        )
        hit = np.asarray(want.is_hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
