"""Progressive engine: incremental edits, accumulation, picking, checkpoint.

Parity surface: hydra/moonshine.h:72-95 + hydra/hydra.zig semantics.
"""

import numpy as np
import pytest

from moonshine_tpu.engine import Engine
from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.scene.types import Lens, translate

from fixtures import icosphere


@pytest.fixture()
def engine():
    e = Engine(PathConfig(max_bounces=4, env_samples_per_bounce=0,
                          mesh_samples_per_bounce=0, unroll=False))
    sphere = icosphere(2, with_normals=False)
    mesh = e.create_mesh(sphere.positions, sphere.indices)
    white = e.create_solid_texture([1.0, 1.0, 1.0])
    black = e.create_solid_texture([0.0, 0.0, 0.0])
    one = e.create_solid_texture(1.0)
    zero = e.create_solid_texture(0.0)
    mat = e.create_material(color=white, metalness=zero, roughness=one,
                            emissive=black)
    inst = e.create_instance(translate(0, 0, 0), [(mesh, mat, False)])
    e.set_background(None)
    e.fixture = dict(mesh=mesh, mat=mat, inst=inst, white=white, black=black,
                     one=one, zero=zero)
    return e


def front_lens():
    return Lens(
        origin=np.float32([0, -3, 0]),
        forward=np.float32([0, 1, 0]),
        up=np.float32([0, 0, 1]),
        vfov=np.pi / 4,
    )


class TestEngine:
    def test_progressive_accumulation_white_furnace(self, engine):
        sensor = engine.create_sensor(16, 16)
        lens = engine.create_lens(front_lens())
        for _ in range(3):
            img = engine.render(sensor, lens)
        assert engine.sample_count(sensor) == 3
        # engine materials are StandardPBR (hydra parity, hydra.zig:423-433),
        # so the furnace is near-white but not exact (GGX+diffuse blend)
        assert abs(img[..., :3].mean() - 1.0) < 0.05
        assert (img[..., 3] == 1.0).all()
        assert np.isfinite(img).all()

    def test_reset_sensor(self, engine):
        sensor = engine.create_sensor(8, 8)
        lens = engine.create_lens(front_lens())
        engine.render(sensor, lens)
        engine.reset_sensor(sensor)
        assert engine.sample_count(sensor) == 0

    def test_material_edit_changes_image(self, engine):
        sensor = engine.create_sensor(12, 12)
        lens = engine.create_lens(front_lens())
        img_white = engine.render(sensor, lens).copy()
        # dim the albedo to 20%
        grey = engine.create_solid_texture([0.2, 0.2, 0.2])
        engine.set_material_color(engine.fixture["mat"], grey)
        engine.reset_sensor(sensor)
        img_grey = engine.render(sensor, lens)
        center = (slice(4, 8), slice(4, 8))
        assert img_grey[center][..., 0].mean() < img_white[center][..., 0].mean()

    def test_visibility_edit(self, engine):
        sensor = engine.create_sensor(12, 12)
        lens = engine.create_lens(front_lens())
        engine.set_instance_visibility(engine.fixture["inst"], False)
        img = engine.render(sensor, lens)
        # nothing visible: pure white env everywhere, zero variance
        assert np.allclose(img[..., :3], 1.0, atol=1e-6)

    def test_transform_edit_and_pick(self, engine):
        lens = engine.create_lens(front_lens())
        hit = engine.pick(lens, 32, 32, 16, 16)  # center: sphere
        assert hit.hit and hit.instance == engine.fixture["inst"]
        assert hit.geometry == 0 and hit.primitive >= 0
        corner = engine.pick(lens, 32, 32, 0, 0)  # corner: background
        assert not corner.hit
        # move the sphere away; center ray now misses
        engine.set_instance_transform(engine.fixture["inst"], translate(10, 0, 0))
        hit2 = engine.pick(lens, 32, 32, 16, 16)
        assert not hit2.hit

    def test_checkpoint_roundtrip(self, engine, tmp_path):
        sensor = engine.create_sensor(8, 8)
        lens = engine.create_lens(front_lens())
        engine.render(sensor, lens)
        engine.render(sensor, lens)
        path = tmp_path / "ckpt.npz"
        engine.save_checkpoint(path, sensor)
        img_before = engine.get_sensor_data(sensor)

        other = Engine(engine.config)
        s2 = other.create_sensor(8, 8)
        other.load_checkpoint(path, s2)
        assert other.sample_count(s2) == 2
        np.testing.assert_array_equal(other.get_sensor_data(s2), img_before)

    def test_metrics(self, engine):
        sensor = engine.create_sensor(8, 8)
        lens = engine.create_lens(front_lens())
        engine.render(sensor, lens)
        assert engine.metrics["renders"] == 1
        assert engine.metrics["rays"] > 0
        assert engine.metrics["last_mrays_per_sec"] > 0

    def test_set_config_rejits(self, engine):
        sensor = engine.create_sensor(8, 8)
        lens = engine.create_lens(front_lens())
        engine.render(sensor, lens)
        engine.set_config(PathConfig(max_bounces=2, env_samples_per_bounce=0,
                                     mesh_samples_per_bounce=0, unroll=False))
        engine.reset_sensor(sensor)
        img = engine.render(sensor, lens)
        assert np.isfinite(img).all()


class TestRenderConcurrency:
    def test_pick_responsive_during_render(self, engine):
        """The engine lock is released during device work (round-3 fix):
        a pick from another thread must not wait for a long frame."""
        import threading
        import time as _time

        sensor = engine.create_sensor(96, 96)
        lens = engine.create_lens(front_lens())
        engine.render(sensor, lens)  # warm the jit caches

        started = threading.Event()
        done = threading.Event()

        def long_render():
            started.set()
            engine.render(sensor, lens, spp=6)
            done.set()

        t = threading.Thread(target=long_render)
        t.start()
        started.wait()
        t0 = _time.perf_counter()
        hit = engine.pick(lens, 96, 96, 48, 48)
        pick_dt = _time.perf_counter() - t0
        render_running = not done.is_set()
        t.join()
        assert hit.hit
        # the pick must not have serialized behind the whole 6-spp frame
        # (generous bounds: suite runs share one loaded CPU)
        if render_running:
            total = engine.metrics["last_frame_seconds"]
            assert pick_dt < max(0.75 * total, 1.0)

    def test_reset_during_render_discards_frame(self, engine):
        """A reset_sensor racing a frame must win: the stale frame's
        accumulation is dropped (generation check)."""
        import threading

        sensor = engine.create_sensor(32, 32)
        lens = engine.create_lens(front_lens())
        engine.render(sensor, lens)
        ready = threading.Event()

        orig_ensure = engine._ensure_scene

        def slow_ensure():
            scene = orig_ensure()
            ready.set()
            return scene

        engine._ensure_scene = slow_ensure
        t = threading.Thread(target=lambda: engine.render(sensor, lens))
        t.start()
        ready.wait()
        engine.reset_sensor(sensor)
        t.join()
        engine._ensure_scene = orig_ensure
        # frame raced the reset; whichever way the interleaving went, the
        # sensor is either cleared (0) or holds at most the raced frame
        assert engine.sample_count(sensor) <= 1


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
