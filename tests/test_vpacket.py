"""Format-V (vector-decode) packet traversal vs the row-format kernels and
the brute-force oracle (interpret mode on CPU; the same kernels compile
natively on TPU — scripts/validate_tpu.py cross-checks there)."""

import numpy as np
import pytest

from moonshine_tpu.accel import packet, traverse, vpacket, wide

from test_bvh import random_rays, random_tris


def build_pair(n_tris, seed, width=16, cap=8):
    tris = random_tris(n_tris, seed=seed)
    w = wide.build_wide(tris, width=width, leaf_cap=cap)
    return tris, w, vpacket.v_from_wide(w)


class TestTiles:
    def test_tile_layout_roundtrip(self):
        """Every bound/ptr/axis/tri field of the V tiles matches the row
        records it was derived from."""
        tris = random_tris(300, seed=7)
        w = wide.build_wide(tris, width=16, leaf_cap=8)
        v = vpacket.v_from_wide(w)
        nodes = np.asarray(w.nodes).reshape(w.num_nodes, -1)
        nt = np.asarray(v.nodes)
        wid = w.width
        ptr = nodes[:, 6 * wid:7 * wid]
        for j in range(wid):
            g, s = j // 8, j % 8
            occupied = ptr[:, j] != -1.0
            for c in range(6):
                want = nodes[:, c * wid + j][occupied]
                got = nt[:, s, 6 * g + c][occupied]
                np.testing.assert_array_equal(got, want)
            np.testing.assert_array_equal(
                nt[:, 0, vpacket.PTR_LANE0 + j], ptr[:, j])
        np.testing.assert_array_equal(
            nt[:, 0, vpacket.AXIS_LANE], nodes[:, 7 * wid])

        leaves = np.asarray(w.leaves).reshape(w.num_leaves, -1)
        lt = np.asarray(v.leaves)
        cap = w.leaf_slots
        for j in range(cap):
            g, s = j // 8, j % 8
            for f in range(9):
                np.testing.assert_array_equal(
                    lt[:, s, 10 * g + f], leaves[:, f * cap + j])
            np.testing.assert_array_equal(
                lt[:, s, 10 * g + 9], leaves[:, 9 * cap + j])

    def test_empty_node_slots_never_hit(self):
        _, w, v = build_pair(37, seed=8)
        nt = np.asarray(v.nodes)
        ptr = nt[:, 0, vpacket.PTR_LANE0:vpacket.PTR_LANE0 + w.width]
        empty = ptr == -1.0
        for c in range(3):
            for j in range(w.width):
                g, s = j // 8, j % 8
                rows = empty[:, j]
                if rows.any():
                    assert (nt[rows, s, 6 * g + c] >= 1e38).all()
                    assert (nt[rows, s, 6 * g + 3 + c] <= -1e38).all()


class TestVTraversal:
    @pytest.mark.parametrize("n_tris,seed,width,cap", [
        (37, 4, 16, 8), (700, 5, 16, 12), (700, 15, 24, 24),
    ])
    def test_closest_matches_row_kernel(self, n_tris, seed, width, cap):
        """Same hits as the row kernels: identical triangle ids everywhere;
        t/u/v agree to ~1 ulp (the compiler contracts the shared
        Moller-Trumbore differently for (8,1)-column vs scalar operands,
        so exact bitwise equality across formulations is not achievable —
        measured 2/512 lanes at 1 ulp)."""
        tris, w, v = build_pair(n_tris, seed, width, cap)
        o, d = random_rays(512, seed=seed + 10)
        want = packet.closest_hit_packet(w, o, d, 1e12)
        got = vpacket.closest_hit_vpacket(v, o, d, 1e12)
        np.testing.assert_array_equal(np.asarray(got.tri),
                                      np.asarray(want.tri))
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.v), np.asarray(want.v),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("n_tris,seed", [(37, 4), (700, 5)])
    def test_closest_matches_oracle(self, n_tris, seed):
        tris, w, v = build_pair(n_tris, seed)
        o, d = random_rays(256, seed=seed + 11)
        got = vpacket.closest_hit_vpacket(v, o, d, 1e12)
        want = traverse.brute_force_closest(tris, o, d, 1e12)
        np.testing.assert_array_equal(
            np.asarray(got.is_hit), np.asarray(want.is_hit))
        hit = np.asarray(want.is_hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4,
            atol=1e-5)

    def test_anyhit_matches_row_kernel(self):
        tris, w, v = build_pair(700, seed=5, width=24, cap=24)
        o, d = random_rays(512, seed=21)
        t_max = 0.75
        want = packet.any_hit_packet(w, o, d, t_max)
        got = vpacket.any_hit_vpacket(v, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_respects_active_mask(self):
        import jax.numpy as jnp

        tris, w, v = build_pair(100, seed=6)
        o, d = random_rays(128, seed=22)
        active = jnp.arange(128) % 3 == 0
        got = vpacket.closest_hit_vpacket(v, o, d, 1e12, active_in=active)
        inactive = ~np.asarray(active)
        assert (np.asarray(got.tri)[inactive] == -1).all()

    def test_hbm_wrappers_match(self):
        tris, w, v = build_pair(700, seed=5, width=24, cap=24)
        o, d = random_rays(256, seed=23)
        a = vpacket.closest_hit_vpacket(v, o, d, 1e12)
        b = vpacket.closest_hit_vpacket_hbm(v, o, d, 1e12)
        np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
