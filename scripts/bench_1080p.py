"""1080p staged-path measurement (VERDICT round-2 item 2 evidence).

Renders the 184k-triangle room interior at 512x512 (fused dispatch) and
1920x1080 (staged per-bounce path, resort ON at full scale) and reports
Mrays/s + spp/s for both. The acceptance bar: 1080p per-ray throughput
within 15% of the 512^2 rate — i.e. the old >1M-lane XLA scheduling
cliff (>10x collapse) is gone.
"""

import os as _os
import pathlib as _pl
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(_pl.Path(__file__).resolve().parent.parent / ".jax_cache"))


import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax

from moonshine_tpu.integrator import PathConfig
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render.renderer import render_spp
from moonshine_tpu.scene.procedural import room_scene


def measure(scene, la, h, w, spp, cfg):
    img, rays = render_spp(scene, la, h, w, 0, spp, cfg)
    img.block_until_ready()
    t0 = time.perf_counter()
    img, rays = render_spp(scene, la, h, w, spp, spp, cfg)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    return float(rays) / dt / 1e6, spp / dt


def main(argv=None):
    # round-5 measurement hygiene: each resolution is its own compiled
    # variant, so by default each runs in its OWN subprocess (in-process
    # variant sweeps corrupt on the tunneled chip — see bench_ladder.py)
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["512", "1080"], default=None)
    args = ap.parse_args(argv)

    if args.only is None:
        here = str(pathlib.Path(__file__).resolve())
        for rung in ("512", "1080"):
            proc = subprocess.run(
                [sys.executable, here, "--only", rung],
                capture_output=True, text=True, timeout=3600)
            for ln in proc.stdout.splitlines():
                if ln.startswith("{"):
                    print(ln, flush=True)
            if proc.returncode:
                print(f"[{rung}] FAILED:\n{proc.stderr[-1500:]}", flush=True)
        return

    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
    la = LensArrays.from_lens(lens)
    cfg = PathConfig(max_bounces=4, env_samples_per_bounce=1,
                     mesh_samples_per_bounce=1)

    if args.only == "512":
        m512, s512 = measure(scene, la, 512, 512, 3, cfg)
        print(json.dumps({"res": "512x512", "mrays_per_sec": round(m512, 3),
                          "spp_per_sec": round(s512, 3)}), flush=True)
    else:
        m1080, s1080 = measure(scene, la, 1080, 1920, 2, cfg)
        print(json.dumps({"res": "1920x1080",
                          "mrays_per_sec": round(m1080, 3),
                          "spp_per_sec": round(s1080, 4)}), flush=True)


if __name__ == "__main__":
    main()
