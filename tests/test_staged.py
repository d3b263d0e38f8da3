"""Staged per-bounce rendering path (renderer._render_spp_staged) must
produce bit-identical images to the fused path — it is the same math with
per-bounce device dispatches and donated state (the >1M-lane fix)."""

import jax.numpy as jnp
import numpy as np

from moonshine_tpu.integrator.path import PathConfig
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render import renderer
from moonshine_tpu.scene.types import (
    Geometry, Instance, Lambert, Lens, MaterialInfo, identity_transform,
)
from moonshine_tpu.scene.world import World

from fixtures import icosphere


def _scene():
    w = World()
    mesh = w.add_mesh(icosphere(2, with_normals=False))
    mat = w.add_material(MaterialInfo(variant=Lambert(color=(0.7, 0.5, 0.3))))
    w.add_instance(Instance(transform=identity_transform(),
                            geometries=[Geometry(mesh, mat)]))
    sky = np.full((4, 8, 3), 0.8, np.float32)
    w.set_background(sky)
    lens = Lens(origin=np.float32([0, -3, 0]), forward=np.float32([0, 1, 0]),
                up=np.float32([0, 0, 1]), vfov=np.pi / 4)
    return w.build(), lens


def test_staged_matches_fused():
    scene, lens = _scene()
    la = LensArrays.from_lens(lens)
    cfg = PathConfig(max_bounces=2)
    fused, rays_f = renderer._render_spp_band(
        scene, la, 64, 64, 0, 3, 2, cfg, True, band_h=64)
    staged, rays_s = renderer._render_spp_staged(
        scene, la, 64, 64, 3, 2, cfg, True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(staged))
    assert float(rays_f) == float(rays_s)


def test_staged_with_forced_resort():
    """Resort moves lanes mid-trace; the scatter-back must restore pixel
    order identically in the staged path."""
    scene, lens = _scene()
    la = LensArrays.from_lens(lens)
    cfg = PathConfig(max_bounces=2, resort_bounces=True)
    ref_cfg = PathConfig(max_bounces=2, resort_bounces=False)
    fused, _ = renderer._render_spp_band(
        scene, la, 64, 64, 0, 1, 1, ref_cfg, True, band_h=64)
    staged, _ = renderer._render_spp_staged(
        scene, la, 64, 64, 1, 1, cfg, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(staged),
                               rtol=1e-5, atol=1e-6)
