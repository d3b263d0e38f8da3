"""BSDF correctness: reciprocity of conventions, pdf consistency, energy."""

import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.bsdf import materials as M
from moonshine_tpu.core import mappings


def lanes(n, type_, color=(1.0, 1.0, 1.0), metalness=0.0, roughness=0.5, ior=1.5):
    return M.MaterialLanes(
        type=jnp.full(n, type_, jnp.int32),
        color=jnp.tile(jnp.asarray(color, jnp.float32), (n, 1)),
        metalness=jnp.full(n, metalness, jnp.float32),
        alpha=jnp.full(n, max(roughness**2, 1e-3), jnp.float32),
        ior=jnp.full(n, ior, jnp.float32),
    )


def grid(n):
    u = (np.arange(n) + 0.5) / n
    g = np.stack(np.meshgrid(u, u, indexing="ij"), -1).reshape(-1, 2)
    return jnp.asarray(g, jnp.float32)


W_O = jnp.asarray([0.3, -0.2, 0.9], jnp.float32)
W_O = W_O / jnp.linalg.norm(W_O)


def mc_reflectance(mat_type, n=96, **kw):
    """E[eval * |cos| / pdf] over BSDF samples = directional albedo."""
    sq = grid(n)
    N = sq.shape[0]
    mat = lanes(N, mat_type, **kw)
    w_o = jnp.tile(W_O, (N, 1))
    w_i, pdf = M.sample_bsdf(mat, w_o, sq)
    f = M.eval_bsdf(mat, w_i, w_o)
    contrib = f * (jnp.abs(w_i[:, 2]) / jnp.maximum(pdf, 1e-12))[:, None]
    contrib = jnp.where((pdf > 0)[:, None], contrib, 0.0)
    return np.asarray(contrib.mean(0))


class TestFresnel:
    def test_normal_incidence(self):
        f = M.fresnel_dielectric(jnp.asarray([1.0]), 1.0, 1.5)
        assert np.allclose(np.asarray(f), ((1.5 - 1) / (1.5 + 1)) ** 2, atol=1e-6)

    def test_grazing_is_one(self):
        f = M.fresnel_dielectric(jnp.asarray([1e-4]), 1.0, 1.5)
        assert np.asarray(f)[0] > 0.99

    def test_tir(self):
        # from inside glass at shallow angle: total internal reflection
        f = M.fresnel_dielectric(jnp.asarray([-0.2]), 1.0, 1.5)
        assert np.asarray(f)[0] == 1.0


class TestLambert:
    def test_white_furnace(self):
        r = mc_reflectance(M.LAMBERT, color=(1, 1, 1))
        assert np.allclose(r, 1.0, atol=1e-5)  # exact: cosine sampling

    def test_albedo(self):
        r = mc_reflectance(M.LAMBERT, color=(0.25, 0.5, 0.75))
        assert np.allclose(r, [0.25, 0.5, 0.75], atol=1e-5)

    def test_pdf_matches_sample(self):
        sq = grid(32)
        mat = lanes(sq.shape[0], M.LAMBERT)
        w_o = jnp.tile(W_O, (sq.shape[0], 1))
        w_i, pdf = M.sample_bsdf(mat, w_o, sq)
        pdf2 = M.pdf_bsdf(mat, w_i, w_o)
        assert np.allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-5)

    def test_pdf_integrates_to_one(self):
        # uniform-hemisphere MC of the pdf
        sq = grid(128)
        dirs = mappings.square_to_uniform_hemisphere(sq)
        mat = lanes(sq.shape[0], M.LAMBERT)
        w_o = jnp.tile(W_O, (sq.shape[0], 1))
        p = M.pdf_bsdf(mat, dirs, w_o)
        integral = np.asarray(p).mean() * 2 * np.pi
        assert abs(integral - 1.0) < 2e-2


class TestStandardPBR:
    @pytest.mark.parametrize("metalness,roughness", [(0.0, 0.5), (1.0, 0.3), (0.5, 0.8), (0.0, 0.05)])
    def test_pdf_matches_sample(self, metalness, roughness):
        sq = grid(48)
        mat = lanes(sq.shape[0], M.STANDARD_PBR, metalness=metalness, roughness=roughness)
        w_o = jnp.tile(W_O, (sq.shape[0], 1))
        w_i, pdf = M.sample_bsdf(mat, w_o, sq)
        pdf2 = M.pdf_bsdf(mat, w_i, w_o)
        ok = np.asarray(pdf) > 1e-4
        # f32 half-vector reconstruction wobbles a few % on sharp lobes
        assert np.allclose(np.asarray(pdf)[ok], np.asarray(pdf2)[ok], rtol=5e-2)

    @pytest.mark.parametrize("metalness,roughness", [(0.0, 0.6), (1.0, 0.4), (0.3, 0.9)])
    def test_sample_distribution_matches_pdf(self, metalness, roughness):
        # The mixture pdf deliberately integrates to < 1: microfacet
        # reflections clipped below the horizon get pdf 0 and terminate
        # the path (integrator.hlsl:154-155). So instead of normalization we
        # check distributional consistency: for a smooth test function g,
        #   E_draws[g(w_i); pdf>0]  ==  MC-integral of g(w) * pdf(w).
        sq = grid(180)
        N = sq.shape[0]
        mat = lanes(N, M.STANDARD_PBR, metalness=metalness, roughness=roughness)
        w_o = jnp.tile(W_O, (N, 1))
        w_i, pdf = M.sample_bsdf(mat, w_o, sq)
        g = lambda w: 1.0 + w[:, 2] ** 2
        lhs = np.asarray(jnp.where(pdf > 0, g(w_i), 0.0)).mean()

        dirs = mappings.square_to_uniform_hemisphere(grid(256))
        mat2 = lanes(dirs.shape[0], M.STANDARD_PBR, metalness=metalness, roughness=roughness)
        w_o2 = jnp.tile(W_O, (dirs.shape[0], 1))
        p = M.pdf_bsdf(mat2, dirs, w_o2)
        rhs = np.asarray(g(dirs) * p).mean() * 2 * np.pi
        assert abs(lhs - rhs) < 0.03 * max(abs(rhs), 1.0), (lhs, rhs)

    def test_energy_bounded(self):
        for metalness in (0.0, 0.5, 1.0):
            r = mc_reflectance(M.STANDARD_PBR, metalness=metalness, roughness=0.5)
            assert (r < 1.35).all(), (metalness, r)  # non-VNDF GGX overshoots slightly

    def test_smooth_metal_mirrors(self):
        # near-zero roughness metal: sampled direction concentrates at mirror
        sq = grid(16)
        mat = lanes(sq.shape[0], M.STANDARD_PBR, metalness=1.0, roughness=0.02)
        w_o = jnp.tile(W_O, (sq.shape[0], 1))
        w_i, pdf = M.sample_bsdf(mat, w_o, sq)
        mirror = jnp.asarray([-W_O[0], -W_O[1], W_O[2]])
        cos_sim = np.asarray(jnp.sum(w_i * mirror, axis=-1))
        spec = np.asarray(pdf) > 1.0  # specular-lobe draws
        assert (cos_sim[spec] > 0.99).all()


class TestMirror:
    def test_perfect_throughput(self):
        r = mc_reflectance(M.MIRROR)
        assert np.allclose(r, 1.0, atol=1e-5)

    def test_reflects(self):
        mat = lanes(1, M.MIRROR)
        w_i, pdf = M.sample_bsdf(mat, W_O[None], jnp.asarray([[0.5, 0.5]]))
        assert np.allclose(np.asarray(w_i)[0], [-W_O[0], -W_O[1], W_O[2]], atol=1e-6)
        assert np.asarray(pdf)[0] == 1.0

    def test_delta_flags(self):
        t = jnp.asarray([M.GLASS, M.LAMBERT, M.MIRROR, M.STANDARD_PBR])
        assert np.asarray(M.is_delta(t)).tolist() == [True, False, True, False]


class TestGlass:
    def test_energy_conserved(self):
        r = mc_reflectance(M.GLASS, ior=1.5)
        assert np.allclose(r, 1.0, atol=1e-3)

    def test_snell(self):
        # refraction obeys Snell's law: sin_t = sin_i / ior
        sq = jnp.asarray([[0.999, 0.5]])  # force the refract branch
        mat = lanes(1, M.GLASS, ior=1.5)
        w_i, pdf = M.sample_bsdf(mat, W_O[None], sq)
        w_i = np.asarray(w_i)[0]
        assert w_i[2] < 0  # went through
        sin_i = np.sqrt(1 - float(W_O[2]) ** 2)
        sin_t = np.sqrt(max(0.0, 1 - w_i[2] ** 2))
        assert abs(sin_t - sin_i / 1.5) < 2e-4

    def test_tir_from_inside(self):
        # shallow exit angle from inside -> fresnel=1 -> always reflects
        w_o = jnp.asarray([[0.95, 0.0, -np.sqrt(1 - 0.95**2)]], jnp.float32)
        mat = lanes(1, M.GLASS, ior=1.5)
        for rx in (0.1, 0.9):
            w_i, pdf = M.sample_bsdf(mat, w_o, jnp.asarray([[rx, 0.5]]))
            assert np.asarray(w_i)[0, 2] < 0  # stays inside
            assert np.asarray(pdf)[0] == 1.0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
