"""End-to-end furnace tests — the reference's core correctness suite.

Parity targets (engine/tests.zig):
  1. "white sphere on white background is white" — albedo-1 Lambert sphere
     in a constant unit env, NEE off: every pixel == 1 (:257-345).
  2. same with env NEE + MIS on: tolerance 0.1 (:347-363).
  3. "inside illuminating sphere is white" — interior albedo 0.5 +
     emissive 0.5 sums the geometric series to 1 (:366-455).
  4. the reference's commented-out mesh-light-sampling variant of (3),
     enabled here since our API supports it (:457-487).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.render.renderer import render
from moonshine_tpu.scene.types import (
    Geometry,
    Instance,
    Lambert,
    Lens,
    MaterialInfo,
    identity_transform,
)
from moonshine_tpu.scene.world import World

from fixtures import icosphere


def jnp_traversal(scene):
    """Drop the wide BVH so trace_paths uses the jnp traversal — the Pallas
    packet kernel in interpret mode is far too slow for CPU furnace renders
    (its correctness is covered by test_packet.py)."""
    return scene._replace(wide=None)


def furnace_world(albedo=1.0, emissive=0.0, interior=False, sampled=False,
                  subdivisions=3):
    world = World()
    # no vertex normals, like the reference furnace fixture
    # (tests.zig:242 ".normals = null"): shading frame == geometric frame, so
    # cosine samples can never tunnel below the surface
    mesh = world.add_mesh(
        icosphere(subdivisions, reverse_winding=interior, with_normals=False)
    )
    mat = world.add_material(
        MaterialInfo(
            variant=Lambert(color=(albedo, albedo, albedo)),
            emissive=(emissive, emissive, emissive),
        )
    )
    world.add_instance(
        Instance(
            transform=identity_transform(),
            geometries=[Geometry(mesh=mesh, material=mat, sampled=sampled)],
        )
    )
    world.set_background(None)  # constant white env
    return world


def outside_lens():
    return Lens(
        origin=np.asarray([0.0, -3.0, 0.0], np.float32),
        forward=np.asarray([0.0, 1.0, 0.0], np.float32),
        up=np.asarray([0.0, 0.0, 1.0], np.float32),
        vfov=np.pi / 4,
    )


def inside_lens():
    return Lens(
        origin=np.zeros(3, np.float32),
        forward=np.asarray([0.0, 1.0, 0.0], np.float32),
        up=np.asarray([0.0, 0.0, 1.0], np.float32),
        vfov=np.pi / 3,
    )


class TestFurnace:
    def test_white_sphere_white_background_no_nee(self):
        scene = jnp_traversal(furnace_world(albedo=1.0).build())
        cfg = PathConfig(max_bounces=64, env_samples_per_bounce=0,
                         mesh_samples_per_bounce=0)
        sensor, _ = render(scene, outside_lens(), 48, 48, spp=4, cfg=cfg)
        img = np.asarray(sensor.image)
        err = np.abs(img - 1.0)
        assert err.max() < 1e-4, f"max abs err {err.max()}"

    def test_white_sphere_white_background_with_mis(self):
        scene = jnp_traversal(furnace_world(albedo=1.0).build())
        cfg = PathConfig(max_bounces=64, env_samples_per_bounce=1,
                         mesh_samples_per_bounce=0)
        sensor, _ = render(scene, outside_lens(), 32, 32, spp=96, cfg=cfg)
        img = np.asarray(sensor.image)
        err = np.abs(img - 1.0)
        assert err.max() < 0.1, f"max abs err {err.max()}"  # tests.zig:359-362

    def test_inside_illuminating_sphere(self):
        scene = jnp_traversal(furnace_world(albedo=0.5, emissive=0.5, interior=True).build())
        cfg = PathConfig(max_bounces=64, env_samples_per_bounce=0,
                         mesh_samples_per_bounce=0)
        # the reference bounds max abs err by 0.02 at 1024 spp
        # (tests.zig:450-453); at CPU-test spp the same estimator gives
        # proportionally wider per-pixel noise, so bound mean + max.
        sensor, _ = render(scene, inside_lens(), 16, 16, spp=256, cfg=cfg)
        img = np.asarray(sensor.image)
        err = np.abs(img - 1.0)
        assert abs(img.mean() - 1.0) < 5e-3, f"mean {img.mean()}"
        assert err.max() < 0.06, f"max abs err {err.max()}"

    def test_inside_illuminating_sphere_sampled_light(self):
        # the reference's pending test (tests.zig:457-487): identical furnace
        # but with the emissive sphere in the NEE alias table
        scene = jnp_traversal(furnace_world(
            albedo=0.5, emissive=0.5, interior=True, sampled=True
        ).build())
        cfg = PathConfig(max_bounces=64, env_samples_per_bounce=0,
                         mesh_samples_per_bounce=1)
        sensor, _ = render(scene, inside_lens(), 16, 16, spp=128, cfg=cfg)
        img = np.asarray(sensor.image)
        err = np.abs(img - 1.0)
        assert abs(img.mean() - 1.0) < 5e-3, f"mean {img.mean()}"
        assert err.max() < 0.06, f"max abs err {err.max()}"


class TestFurnacePacketPath:
    def test_white_furnace_through_packet_kernel(self):
        # same physics as test 1 but through the Pallas packet traversal
        # (interpret mode on CPU), small enough to stay fast
        scene = furnace_world(albedo=1.0, subdivisions=1).build()
        cfg = PathConfig(max_bounces=16, env_samples_per_bounce=0,
                         mesh_samples_per_bounce=0)
        sensor, _ = render(scene, outside_lens(), 8, 8, spp=2, cfg=cfg)
        img = np.asarray(sensor.image)
        assert np.abs(img - 1.0).max() < 1e-4


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
