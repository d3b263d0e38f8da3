"""Viewer (online analogue), direct-light integrator, DDS, DisneyDiffuse."""

import struct
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from moonshine_tpu.engine import Engine
from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.integrator.direct import DirectConfig, trace_direct
from moonshine_tpu.io import dds
from moonshine_tpu.render.viewer import Viewer, tonemap
from moonshine_tpu.scene.types import Lens, translate
from moonshine_tpu.bsdf import materials as M

from fixtures import icosphere


def small_engine():
    e = Engine(PathConfig(max_bounces=2, env_samples_per_bounce=0,
                          mesh_samples_per_bounce=0, unroll=False))
    sphere = icosphere(1, with_normals=False)
    mesh = e.create_mesh(sphere.positions, sphere.indices)
    white = e.create_solid_texture([0.8, 0.8, 0.8])
    black = e.create_solid_texture([0.0, 0.0, 0.0])
    one = e.create_solid_texture(1.0)
    zero = e.create_solid_texture(0.0)
    mat = e.create_material(color=white, metalness=zero, roughness=one,
                            emissive=black)
    e.create_instance(translate(0, 0, 0), [(mesh, mat, False)])
    e.set_background(None)
    return e


def front_lens():
    return Lens(origin=np.float32([0, -3, 0]), forward=np.float32([0, 1, 0]),
                up=np.float32([0, 0, 1]), vfov=np.pi / 4)


class TestViewer:
    def test_step_and_keys(self):
        v = Viewer(small_engine(), front_lens(), 8, 8)
        v.step()
        assert v.status()["samples"] == 1
        v.step()
        assert v.status()["samples"] == 2
        origin_before = np.asarray(v.lens.origin).copy()
        v.handle_key("w")  # move -> accumulation restarts
        assert v.status()["samples"] == 0
        assert not np.allclose(np.asarray(v.lens.origin), origin_before)
        v.step()
        png = v.frame_png()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_turn_keeps_unit_forward(self):
        v = Viewer(small_engine(), front_lens(), 8, 8)
        for _ in range(5):
            v.handle_key("q")
        assert abs(np.linalg.norm(np.asarray(v.lens.forward)) - 1.0) < 1e-5

    def test_max_samples_cap(self):
        v = Viewer(small_engine(), front_lens(), 8, 8)
        v.max_samples = 2
        for _ in range(5):
            v.step()
        assert v.status()["samples"] == 2

    def test_web_server_roundtrip(self):
        v = Viewer(small_engine(), front_lens(), 8, 8)
        v.step()
        port = 8731
        t = threading.Thread(
            target=lambda: v.run_web(port=port, background_render=False),
            daemon=True,
        )
        t.start()
        import time

        deadline = time.time() + 10
        last = None
        while time.time() < deadline:
            try:
                page = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=2).read()
                break
            except Exception as e:
                last = e
                time.sleep(0.2)
        else:
            raise AssertionError(f"server never came up: {last}")
        assert b"moonshine_tpu" in page
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png", timeout=5).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/key/w", method="POST")
        assert urllib.request.urlopen(req, timeout=5).status == 200
        assert v.status()["samples"] == 0  # key moved the camera

    def test_edit_panel_roundtrip(self):
        """Edit-panel surface (online/main.zig:154-285 parity): pick,
        material edit, transform edit, visibility, config rebuild — all
        through the HTTP endpoints the browser panel uses."""
        import json
        import time

        v = Viewer(small_engine(), front_lens(), 16, 16)
        v.step()
        port = 8733
        t = threading.Thread(
            target=lambda: v.run_web(port=port, background_render=False),
            daemon=True,
        )
        t.start()
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                urllib.request.urlopen(base + "/", timeout=2).read()
                break
            except Exception:
                time.sleep(0.2)

        def post(path, body):
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(), method="POST")
            # generous timeout: the first /pick jit-compiles the 1-ray
            # closest-hit trace
            return urllib.request.urlopen(req, timeout=180)

        # pick the sphere (image center)
        info = json.loads(post("/pick", {"u": 0.5, "v": 0.5}).read())
        assert info["hit"] and info["instance"] == 0
        # pick background (top-left corner) misses
        miss = json.loads(post("/pick", {"u": 0.02, "v": 0.02}).read())
        assert not miss["hit"]

        # re-pick the sphere and edit its material to pure red
        post("/pick", {"u": 0.5, "v": 0.5})
        post("/edit/material", {"color": [1.0, 0.0, 0.0],
                                "roughness": 1.0, "metalness": 0.0})
        v.step()
        frame = np.asarray(v.engine.get_sensor_data(v.sensor))
        center = frame[8, 8, :3]
        assert center[0] > center[2] + 0.1  # visibly red now

        # translate it out of frame -> center shows the white env
        post("/edit/transform", {"delta": [100.0, 0.0, 0.0]})
        v.step()
        frame = np.asarray(v.engine.get_sensor_data(v.sensor))
        assert abs(frame[8, 8, :3].mean() - 1.0) < 1e-3

        # visibility toggle brings it back hidden/shown
        post("/edit/transform", {"delta": [-100.0, 0.0, 0.0]})
        post("/edit/visibility", {"visible": False})
        v.step()
        frame = np.asarray(v.engine.get_sensor_data(v.sensor))
        assert abs(frame[8, 8, :3].mean() - 1.0) < 1e-3

        # spec-constant editor: config propagates to the engine (re-jit)
        post("/config", {"max_bounces": 3})
        assert v.engine.config.max_bounces == 3
        status = json.loads(urllib.request.urlopen(
            base + "/status", timeout=5).read())
        assert status["config"]["max_bounces"] == 3

    def test_async_frame_pipelining(self):
        """wait=False queues frames without host syncs (the Display
        frames-in-flight analogue); a later wait drains and accounts
        every queued sample."""
        v = Viewer(small_engine(), front_lens(), 8, 8)
        assert v.step(wait=False) is None
        assert v.step(wait=False) is None
        frame = v.step(wait=True)  # drains the queue
        assert frame is not None
        assert v.engine.sample_count(v.sensor) == 3
        assert v.engine.metrics["rays"] > 0  # pending counters accounted
        assert np.isfinite(frame).all()

    def test_tonemap(self):
        lin = np.zeros((2, 2, 4), np.float32)
        lin[..., :3] = [[[0.0, 0.5, 10.0]] * 2] * 2
        out = tonemap(lin)
        assert out.dtype == np.uint8
        assert out[0, 0, 0] == 0 and out[0, 0, 2] == 255
        assert 180 < out[0, 0, 1] < 195  # sRGB(0.5) ~ 188


class TestDirectIntegrator:
    def test_direct_matches_path_for_single_bounce_scene(self):
        # a lambert sphere under a constant env with NEE: direct-light
        # integrator equals full path tracing limited to 0 bounces
        from test_furnace import furnace_world, outside_lens, jnp_traversal
        from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
        from moonshine_tpu.core import rng as R

        scene = jnp_traversal(furnace_world(albedo=0.6).build())
        lens = LensArrays.from_lens(outside_lens())
        N = 256
        px = jnp.arange(N, dtype=jnp.uint32) % 16
        py = jnp.arange(N, dtype=jnp.uint32) // 16
        rng = R.seed(0, px, py)
        rng, jit2 = R.next_float2(rng)
        uv = pixel_uv(px, py, 16, 16, jit2, True)
        rng, ap = R.next_float2(rng)
        o, d = generate_rays(lens, 16, 16, uv, ap)
        rad, _, rays = trace_direct(
            scene, o, d, rng, DirectConfig(env_samples_per_bounce=1,
                                           mesh_samples_per_bounce=0)
        )
        rad = np.asarray(rad)
        assert np.isfinite(rad).all()
        assert float(rays) > N  # primary + shadow rays
        # background pixels see exactly 1.0
        miss = rad[:, 0] == 1.0
        assert miss.any()


class TestDds:
    def build_dds(self, dxgi=71, w=64, h=32, mips=3):
        hdr = struct.pack("<I", dds.DDS_MAGIC)
        header = bytearray(124)
        struct.pack_into("<3I", header, 0, 124, 0x1007, h)
        struct.pack_into("<I", header, 12, w)
        struct.pack_into("<I", header, 24, mips)
        # pixel format at offset 72 within header: size 32, flags FOURCC
        struct.pack_into("<II4s", header, 72, 32, 0x4, b"DX10")
        dx10 = struct.pack("<5I", dxgi, 3, 0, 1, 0)
        return hdr + bytes(header) + dx10 + b"\x00" * 64

    def test_parse(self):
        h = dds.parse_header(self.build_dds())
        assert (h.width, h.height, h.mip_count) == (64, 32, 3)
        assert h.format_name == "bc1_rgba_unorm"

    def test_reject_non_dds(self):
        with pytest.raises(ValueError):
            dds.parse_header(b"nope" * 64)

    def test_reject_unknown_format(self):
        with pytest.raises(ValueError):
            dds.parse_header(self.build_dds(dxgi=10))


class TestDisneyDiffuse:
    def test_energy_below_lambert_at_grazing(self):
        w_o = jnp.asarray([[0.1, 0.0, 0.995]], jnp.float32)
        w_o = w_o / jnp.linalg.norm(w_o)
        w_i = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        color = jnp.ones((1, 3), jnp.float32)
        f = M.disney_diffuse_eval(color, jnp.asarray([0.0]), w_i, w_o)
        # roughness 0: pure fresnel-weighted lambert, < 1/pi
        assert float(f[0, 0]) < 1.0 / np.pi

    def test_sample_pdf_consistent(self):
        sq = jnp.asarray(np.random.RandomState(0).rand(64, 2), jnp.float32)
        w_o = jnp.tile(jnp.asarray([0.3, -0.2, 0.93]), (64, 1))
        w_o = w_o / jnp.linalg.norm(w_o, axis=-1, keepdims=True)
        w_i, pdf = M.disney_diffuse_sample(None, None, w_o, sq)
        pdf2 = M.disney_diffuse_pdf(w_i, w_o)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
