"""Multi-chip sharding: sharded render must match the single-device one."""

import jax
import numpy as np
import pytest

from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.parallel import make_mesh, render_sharded
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render.renderer import render

from test_furnace import furnace_world, outside_lens


@pytest.fixture(scope="module")
def setup():
    scene = furnace_world(albedo=0.6).build()._replace(wide=None)
    lens = outside_lens()
    # unroll=False: ten unrolled bounce segments under an 8-device shard_map
    # is a compile-time explosion on the CPU test mesh
    cfg = PathConfig(max_bounces=8, env_samples_per_bounce=1,
                     mesh_samples_per_bounce=0, unroll=False)
    return scene, lens, cfg


class TestSharded:
    def test_eight_device_mesh_exists(self):
        assert len(jax.devices()) == 8

    def test_matches_single_device(self, setup):
        scene, lens, cfg = setup
        H, W, spp = 16, 16, 4
        sensor, _ = render(scene, lens, H, W, spp, cfg)
        want = np.asarray(sensor.image)

        mesh = make_mesh(sp=2)  # 2 sample x 4 row shards
        img, rays = render_sharded(
            scene, LensArrays.from_lens(lens), H, W, spp, cfg, mesh
        )
        got = np.asarray(img)
        assert float(rays) > 0
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_pure_dp_mesh(self, setup):
        scene, lens, cfg = setup
        H, W, spp = 16, 16, 2
        mesh = make_mesh(sp=1)  # 8 row shards
        img, _ = render_sharded(
            scene, LensArrays.from_lens(lens), H, W, spp, cfg, mesh
        )
        sensor, _ = render(scene, lens, H, W, spp, cfg)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(sensor.image), atol=2e-6
        )

    def test_rejects_bad_shapes(self, setup):
        scene, lens, cfg = setup
        mesh = make_mesh(sp=2)
        with pytest.raises(ValueError):
            render_sharded(
                scene, LensArrays.from_lens(lens), 15, 16, 4, cfg, mesh
            )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
