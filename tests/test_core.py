"""Unit + statistical tests for the sampling core.

These are the "proper statistical tests of sampling routines" the reference
wished it had (README TODO, reference README.md:59-63).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.core import rng, mappings, frame, mathutil, alias_table


def uniform_grid(n):
    """Stratified interior points of the unit square, [n*n, 2]."""
    u = (np.arange(n) + 0.5) / n
    g = np.stack(np.meshgrid(u, u, indexing="ij"), axis=-1).reshape(-1, 2)
    return jnp.asarray(g, jnp.float32)


class TestRng:
    def test_deterministic_and_decorrelated(self):
        s1 = rng.seed(0, jnp.arange(64), jnp.arange(64))
        s2 = rng.seed(0, jnp.arange(64), jnp.arange(64))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        s3 = rng.seed(1, jnp.arange(64), jnp.arange(64))
        assert np.mean(np.asarray(s1) == np.asarray(s3)) < 0.05

    def test_uniformity(self):
        state = rng.seed(0, jnp.arange(4096) % 64, jnp.arange(4096) // 64)
        samples = []
        for _ in range(16):
            state, f = rng.next_float(state)
            samples.append(np.asarray(f))
        x = np.concatenate(samples)
        assert x.min() >= 0.0 and x.max() < 1.0
        assert abs(x.mean() - 0.5) < 5e-3
        assert abs(x.var() - 1.0 / 12.0) < 5e-3
        # chi-square over 64 bins
        hist, _ = np.histogram(x, bins=64, range=(0, 1))
        expected = len(x) / 64
        chi2 = ((hist - expected) ** 2 / expected).sum()
        assert chi2 < 64 + 5 * np.sqrt(2 * 64)  # ~5 sigma

    def test_lane_independence(self):
        state = rng.seed(0, jnp.zeros(2, jnp.uint32), jnp.arange(2))
        state, f = rng.next_float(state)
        assert not np.allclose(np.asarray(f)[0], np.asarray(f)[1])


class TestMappings:
    def test_triangle_barycentric_valid(self):
        b = np.asarray(mappings.square_to_triangle(uniform_grid(64)))
        assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
        # uniform over the triangle => E[a] = E[b] = 1/3
        assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)

    def test_disk_concentric(self):
        d = np.asarray(mappings.square_to_uniform_disk_concentric(uniform_grid(64)))
        r2 = (d**2).sum(-1)
        assert (r2 <= 1 + 1e-6).all()
        assert abs(r2.mean() - 0.5) < 5e-3  # E[r^2] = 1/2 for uniform disk
        assert np.allclose(d.mean(0), 0.0, atol=5e-3)

    def test_cosine_hemisphere(self):
        v = np.asarray(mappings.square_to_cosine_hemisphere(uniform_grid(64)))
        assert np.allclose((v**2).sum(-1), 1.0, atol=1e-5)
        assert (v[:, 2] >= 0).all()
        # E[cos theta] = 2/3 under cosine weighting
        assert abs(v[:, 2].mean() - 2 / 3) < 5e-3

    def test_gaussian(self):
        g = np.asarray(mappings.square_to_gaussian(uniform_grid(128)))
        assert np.allclose(g.mean(0), 0.0, atol=2e-2)
        assert np.allclose(g.var(0), 1.0, atol=2e-2)

    def test_equal_area_roundtrip(self):
        sq = uniform_grid(48)
        d = mappings.square_to_equal_area_sphere(sq)
        assert np.allclose(np.asarray((d**2).sum(-1)), 1.0, atol=1e-4)
        back = np.asarray(mappings.square_to_equal_area_sphere_inverse(d))
        assert np.allclose(back, np.asarray(sq), atol=1e-4)

    def test_equal_area_is_equal_area(self):
        # pixel-counting: directions mapped from a uniform square grid should
        # cover the sphere uniformly => mean of z ~ 0, mean of z^2 ~ 1/3
        d = np.asarray(mappings.square_to_equal_area_sphere(uniform_grid(128)))
        assert abs(d[:, 2].mean()) < 5e-3
        assert abs((d[:, 2] ** 2).mean() - 1 / 3) < 5e-3

    def test_coin_flip_remap(self):
        r = uniform_grid(64)[:, 0]
        take, remapped = mappings.coin_flip_remap(jnp.full_like(r, 0.25), r)
        take, remapped = np.asarray(take), np.asarray(remapped)
        assert abs(take.mean() - 0.25) < 2e-2
        # remapped rand is still uniform in both branches
        assert abs(remapped[take].mean() - 0.5) < 2e-2
        assert abs(remapped[~take].mean() - 0.5) < 2e-2


class TestFrame:
    def test_orthonormal(self):
        n = mathutil.normalize(jnp.asarray(np.random.RandomState(0).randn(128, 3), jnp.float32))
        f = frame.Frame.from_normal(n)
        for a, b in [(f.n, f.s), (f.n, f.t), (f.s, f.t)]:
            assert np.allclose(np.asarray(mathutil.dot(a, b)), 0.0, atol=1e-5)
        for v in f:
            assert np.allclose(np.asarray((v**2).sum(-1)), 1.0, atol=1e-5)

    def test_roundtrip(self):
        rs = np.random.RandomState(1)
        n = mathutil.normalize(jnp.asarray(rs.randn(64, 3), jnp.float32))
        v = jnp.asarray(rs.randn(64, 3), jnp.float32)
        f = frame.Frame.from_normal(n)
        v2 = f.frame_to_world(f.world_to_frame(v))
        assert np.allclose(np.asarray(v2), np.asarray(v), atol=1e-5)

    def test_cos_theta_is_normal_dot(self):
        rs = np.random.RandomState(2)
        n = mathutil.normalize(jnp.asarray(rs.randn(64, 3), jnp.float32))
        v = mathutil.normalize(jnp.asarray(rs.randn(64, 3), jnp.float32))
        f = frame.Frame.from_normal(n)
        got = frame.cos_theta(f.world_to_frame(v))
        want = mathutil.dot(n, v, keepdims=False)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestMathUtil:
    def test_offset_along_normal_moves_off_surface(self):
        rs = np.random.RandomState(3)
        p = jnp.asarray(rs.randn(256, 3) * 100, jnp.float32)
        n = mathutil.normalize(jnp.asarray(rs.randn(256, 3), jnp.float32))
        q = mathutil.offset_along_normal(p, n)
        d = np.asarray(mathutil.dot(q - p, n, keepdims=False))
        assert (d > 0).all()
        # offset must be tiny relative to |p|
        assert (np.linalg.norm(np.asarray(q - p), axis=-1)
                < 1e-3 * np.maximum(np.linalg.norm(np.asarray(p), axis=-1), 1.0)).all()

    def test_face_forward(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        assert np.asarray(mathutil.face_forward(n, d))[0, 2] == -1.0


class TestAliasTable:
    def test_matches_weights(self):
        weights = np.asarray([1.0, 2.0, 3.0, 4.0, 0.0, 6.0])
        table = alias_table.build(weights)
        assert table.count == 6
        assert np.isclose(table.weight_sum, weights.sum())
        r = uniform_grid(256)[:, 0]
        idx, _ = alias_table.sample(table, table.count, r)
        hist = np.bincount(np.asarray(idx), minlength=6) / len(np.asarray(r))
        assert np.allclose(hist, weights / weights.sum(), atol=1e-2)

    def test_remapped_rand_uniform(self):
        table = alias_table.build(np.asarray([1.0, 3.0]))
        r = uniform_grid(256)[:, 0]
        _, remapped = alias_table.sample(table, table.count, r)
        assert abs(np.asarray(remapped).mean() - 0.5) < 1e-2

    def test_padding(self):
        table = alias_table.build(np.asarray([2.0, 1.0]), pad_to=16)
        assert table.select.shape == (16,)
        idx, _ = alias_table.sample(table, table.count, uniform_grid(128)[:, 0])
        assert np.asarray(idx).max() <= 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
