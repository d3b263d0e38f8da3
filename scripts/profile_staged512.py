"""Fused-graph vs staged per-bounce dispatch at 512^2 (262k lanes).

bench_1080p.py found the staged path's per-ray rate at 2M lanes is 1.43x
the fused graph's at 262k — if staged also wins at 262k, the renderer
should switch to it far below MAX_LANES. A/Bs the room and the flagship.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax

from __graft_entry__ import _flagship_scene
from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render import renderer as RR
from moonshine_tpu.scene.procedural import room_scene


def measure(scene, la, cfg, spp, staged):
    orig = RR.MAX_LANES
    RR.MAX_LANES = 1 if staged else orig
    try:
        img, rays = RR.render_spp(scene, la, 512, 512, 0, spp, cfg)
        img.block_until_ready()
        t0 = time.perf_counter()
        img, rays = RR.render_spp(scene, la, 512, 512, spp, spp, cfg)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        return float(rays) / dt / 1e6, dt / spp
    finally:
        RR.MAX_LANES = orig


def main():
    world, rlens = room_scene(grid=6, subdivisions=4)
    room = world.build()
    flag, flens = _flagship_scene()
    for name, scene, lens, cfg, spp in (
        ("room_184k", room, rlens,
         PathConfig(max_bounces=4), 3),
        ("flagship", flag, flens,
         PathConfig(max_bounces=4), 4),
    ):
        la = LensArrays.from_lens(lens)
        for staged in (False, True):
            m, sp = measure(scene, la, cfg, spp, staged)
            print(f"{name:10s} staged={int(staged)}: {m:6.3f} Mrays/s"
                  f"  ({sp*1e3:7.1f} ms/spp)", flush=True)


if __name__ == "__main__":
    main()
