"""Wide BVH + Pallas packet traversal vs the brute-force oracle (interpret
mode on CPU; the same kernel compiles natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.accel import packet, traverse, wide

from test_bvh import random_rays, random_tris


def oracle(tris, o, d, t_max=1e12):
    return traverse.brute_force_closest(jnp.asarray(tris), o, d, t_max)


def wide_ids(w):
    return np.asarray(w.leaves[:, 72:80]).astype(np.int64).reshape(-1)


def wide_ptr(w):
    return np.asarray(w.nodes[:, 48:56]).astype(np.int64)


class TestWideBuild:
    def test_leaves_cover_all_tris(self):
        tris = random_tris(333, seed=1)
        w = wide.build_wide(tris)
        ids = wide_ids(w)
        ids = ids[ids >= 0]
        assert sorted(ids.tolist()) == list(range(333))

    def test_child_pointers_valid(self):
        tris = random_tris(500, seed=2)
        w = wide.build_wide(tris)
        ptr = wide_ptr(w)
        internal = ptr[ptr >= 0]
        leaves = ptr[ptr <= -2]
        assert (internal < w.num_nodes).all()
        assert ((-2 - leaves) < w.num_leaves).all()
        # every node/leaf reachable exactly once (tree, not DAG)
        assert len(set(internal.tolist())) == len(internal)
        assert len(set(leaves.tolist())) == len(leaves)

    def test_tiny_scene(self):
        tris = random_tris(3, seed=3)
        w = wide.build_wide(tris)
        assert w.num_nodes == 1

    def test_stack_capacity_static(self):
        """max_stack is shape-encoded (static under jit) and bounds the
        worst-case SMEM stack occupancy; normal trees fit both kernels."""
        w = wide.build_wide(random_tris(700, seed=6))
        assert w.max_depth == w.depth_token.shape[0] >= 1
        assert w.max_stack == (wide.WIDTH - 1) * w.max_depth + 1
        assert packet.stack_ok(w, hbm=False)
        assert packet.stack_ok(w, hbm=True)


class TestPacketTraversal:
    @pytest.mark.parametrize("n_tris,seed", [(37, 4), (700, 5)])
    def test_closest_matches_oracle(self, n_tris, seed):
        tris = random_tris(n_tris, seed=seed)
        w = wide.build_wide(tris)
        o, d = random_rays(256, seed=seed + 10)
        got = packet.closest_hit_packet(w, o, d, 1e12)
        want = oracle(tris, o, d)
        np.testing.assert_array_equal(
            np.asarray(got.is_hit), np.asarray(want.is_hit)
        )
        hit = np.asarray(want.is_hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4,
            atol=1e-5,
        )
        same = np.asarray(got.tri)[hit] == np.asarray(want.tri)[hit]
        assert same.mean() > 0.99

    def test_respects_active_mask(self):
        tris = random_tris(100, seed=6)
        w = wide.build_wide(tris)
        o, d = random_rays(128, seed=7)
        active = jnp.arange(128) % 3 == 0
        got = packet.closest_hit_packet(w, o, d, 1e12, active_in=active)
        assert not np.asarray(got.is_hit)[~np.asarray(active)].any()

    def test_any_hit_matches_closest(self):
        tris = random_tris(400, seed=8)
        w = wide.build_wide(tris)
        o, d = random_rays(512, seed=9)
        closest = packet.closest_hit_packet(w, o, d, 1e12)
        occl = packet.any_hit_packet(w, o, d, 1e12)
        np.testing.assert_array_equal(
            np.asarray(occl), np.asarray(closest.is_hit)
        )

    def test_any_hit_tmax(self):
        tris = random_tris(200, seed=10)
        w = wide.build_wide(tris)
        o, d = random_rays(256, seed=11)
        closest = packet.closest_hit_packet(w, o, d, 1e12)
        occl = packet.any_hit_packet(
            w, o, d, jnp.maximum(closest.t * 0.999, 0.0)
        )
        hit = np.asarray(closest.is_hit)
        assert not np.asarray(occl)[hit].any()

    def test_nonmultiple_block_size(self):
        tris = random_tris(64, seed=12)
        w = wide.build_wide(tris)
        o, d = random_rays(1500, seed=13)  # not a multiple of BLOCK
        got = packet.closest_hit_packet(w, o, d, 1e12)
        want = oracle(tris, o, d)
        np.testing.assert_array_equal(
            np.asarray(got.is_hit), np.asarray(want.is_hit)
        )

    @pytest.mark.parametrize("cap,width", [(12, 16), (16, 16), (24, 24),
                                           (16, 32)])
    def test_fat_row_formats_match_default(self, cap, width):
        """Round-4 fat rows: 12-slot leaves fill the single 128-word row;
        16/24-slot leaves and 24/32-wide nodes span a 256-word two-row
        record ([n, 2, 128] DMA). All formats must produce identical
        results to the 8-slot/8-wide baseline."""
        tris = random_tris(500, seed=21)
        w0 = wide.build_wide(tris)
        w1 = wide.build_wide(tris, leaf_cap=cap, width=width)
        o, d = random_rays(512, seed=22)
        h0 = packet.closest_hit_packet(w0, o, d, 1e12)
        h1 = packet.closest_hit_packet(w1, o, d, 1e12)
        np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h0.tri))
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h0.t),
                                   rtol=1e-6)
        a0 = packet.any_hit_packet(w0, o, d, 5.0)
        a1 = packet.any_hit_packet(w1, o, d, 5.0)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))

    def test_presplit_refs_match_default(self):
        """SBVH spatial splits (opt-in): a scene with room-spanning wall
        triangles builds with clipped duplicate references; traversal
        intersects full triangles, so results are identical."""
        from moonshine_tpu.accel import lbvh

        rs = np.random.RandomState(23)
        c = rs.rand(300, 1, 3).astype(np.float32) * 10
        tris = c + (rs.rand(300, 3, 3).astype(np.float32) - 0.5) * 0.4
        walls = np.asarray([
            [[0, 0, 0], [10, 0, 0], [10, 10, 0]],
            [[0, 0, 0], [10, 10, 0], [0, 10, 0]],
            [[0, 0, 10], [10, 0, 10], [10, 10, 10]],
        ], np.float32)
        tris = np.concatenate([tris, walls])
        refs = lbvh.presplit_refs(tris, max_refs_factor=1.5)
        assert len(refs[0]) > len(tris)  # the walls actually split
        bvh, cl, ch = lbvh.build_sah(tris, as_numpy=True, refs=refs)
        w1 = wide.build_wide(tris, binary=bvh, clip_sorted=(cl, ch))
        w0 = wide.build_wide(tris)
        o, d = random_rays(512, seed=24)
        h0 = packet.closest_hit_packet(w0, o, d, 1e12)
        h1 = packet.closest_hit_packet(w1, o, d, 1e12)
        np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h0.tri))
        a0 = packet.any_hit_packet(w0, o, d, 6.0)
        a1 = packet.any_hit_packet(w1, o, d, 6.0)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))
        # the jnp fallback walks the same presplit binary tree
        dbvh = lbvh.device_bvh(bvh)
        tvs = jnp.asarray(tris[np.asarray(bvh.tri_order)])
        hf = traverse.closest_hit(dbvh, tvs, o, d, 1e12)
        np.testing.assert_array_equal(np.asarray(hf.tri), np.asarray(h0.tri))

    def test_hbm_variant_matches(self):
        # in interpret mode the HBM wrapper routes through the same logic;
        # real-DMA coverage is exercised by the TPU benchmarks
        tris = random_tris(300, seed=14)
        w = wide.build_wide(tris)
        o, d = random_rays(512, seed=15)
        got = packet.closest_hit_packet_hbm(w, o, d, 1e12)
        want = oracle(tris, o, d)
        np.testing.assert_array_equal(
            np.asarray(got.is_hit), np.asarray(want.is_hit)
        )
        occ = packet.any_hit_packet_hbm(w, o, d, 1e12)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(want.is_hit))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
