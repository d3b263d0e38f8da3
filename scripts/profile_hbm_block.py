"""HBM-kernel packet-width A/B on the room_184k rung (end-to-end).

HBM_BLOCK was tuned in round 2; the integrator around it changed (state
resort, staged decode), so re-check 2048/4096/8192-lane packets.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax

from moonshine_tpu.accel import packet
from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render.renderer import render_spp
from moonshine_tpu.scene.procedural import room_scene


def main():
    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
    la = LensArrays.from_lens(lens)
    cfg = PathConfig(max_bounces=4, env_samples_per_bounce=1,
                     mesh_samples_per_bounce=1)
    SPP = 3
    for hbm_block in (1024, 2048):
        packet.set_block_size(8192, hbm_block)
        jax.clear_caches()
        img, rays = render_spp(scene, la, 512, 512, 0, SPP, cfg)
        img.block_until_ready()
        t0 = time.perf_counter()
        img, rays = render_spp(scene, la, 512, 512, SPP, SPP, cfg)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"hbm_block {hbm_block:5d}: {float(rays)/dt/1e6:6.3f} Mrays/s"
              f"  ({dt/SPP*1e3:7.1f} ms/spp)", flush=True)
    packet.set_block_size(8192, 4096)


if __name__ == "__main__":
    main()
