"""Benchmark: path-tracing throughput on the attached TPU chip.

Renders the flagship procedural scene (Cornell-style box, mirror/glass/PBR
spheres, emissive area light, textured floor — every material and NEE path
live) and reports Mrays/sec/chip against the 50 Mrays/sec/chip north-star
from BASELINE.md.

Prints exactly one JSON line.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

# persistent XLA compile cache: the fused render graph takes minutes to
# compile cold; cached reruns start in seconds (jax honors this env var)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_scene
    from moonshine_tpu.integrator.path import PathConfig
    from moonshine_tpu.render.camera import LensArrays
    from moonshine_tpu.render.renderer import render_spp

    scene, lens = _flagship_scene()
    lens_arrays = LensArrays.from_lens(lens)
    H, W = 512, 512
    cfg = PathConfig(
        max_bounces=4, env_samples_per_bounce=1, mesh_samples_per_bounce=1
    )
    n_samples = 8

    def run(start):
        # one device dispatch for all spp — the per-sample host round-trip
        # over the device tunnel would otherwise dominate the measurement
        return render_spp(scene, lens_arrays, H, W, start, n_samples, cfg)

    # warmup + compile
    acc, rays = run(0)
    acc.block_until_ready()

    # three timed dispatches: the first is the historical headline
    # protocol (rounds 1-4); the min approximates device-bound time with
    # the tunnel's per-dispatch jitter removed (round-5 measurement
    # hygiene — the round-4 driver-vs-builder 36% split was fresh-process
    # vs corrupted-long-process readings of this same dispatch)
    runs = []
    total_rays = None
    for i in range(3):
        t0 = time.perf_counter()
        acc, total_rays = run((i + 1) * n_samples)
        acc.block_until_ready()
        runs.append(time.perf_counter() - t0)

    mrays = float(total_rays) / runs[0] / 1e6
    result = {
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 4),
        "runs_s": [round(r, 4) for r in runs],
        "mrays_best": round(float(total_rays) / min(runs) / 1e6, 3),
        "device_ms_per_spp": round(min(runs) / n_samples * 1e3, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
