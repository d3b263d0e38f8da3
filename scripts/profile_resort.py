"""End-to-end A/B of the per-bounce state resort on the VMEM flagship.

Round 2 rejected VMEM-scene resorts when a full-state reorder cost ~26 ms
(argsort + gathers); the multi-operand lax.sort brought it to ~0.8 ms.
Measures render_sample wall time per sample, resort off vs on.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from moonshine_tpu.integrator.path import PathConfig
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render.renderer import render_sample


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    scene, lens = _flagship_scene()
    la = LensArrays.from_lens(lens)
    H = W = 512

    for resort in (False, True):
        cfg = PathConfig(max_bounces=4, resort_bounces=resort)
        img, rays = render_sample(scene, la, H, W,
                                  jnp.asarray(1, jnp.uint32), cfg)
        dt = timeit(lambda: render_sample(
            scene, la, H, W, jnp.asarray(1, jnp.uint32), cfg)[0])
        mrays = float(rays) / dt / 1e6
        print(f"resort={resort}: {dt*1e3:7.2f} ms/sample  "
              f"{mrays:6.2f} Mrays/s  mean={float(jnp.mean(img)):.6f}",
              flush=True)


if __name__ == "__main__":
    main()
