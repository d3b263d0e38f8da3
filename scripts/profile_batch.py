"""A/B: fused fori_loop spp rendering vs sample-batched staged dispatches.

Hypothesis (BASELINE.md round-3): the 184k room runs 1.43x faster per ray
at 2.07M lanes (1080p staged) than at 262k lanes (512^2 fused) — bigger
sorted dispatches tighten packet-block unions. Batching consecutive
samples onto the lane axis should buy the same amortization at 512^2.

Usage: python scripts/profile_batch.py [--rung flagship|room|mirror_glass]
"""

import argparse
import os
import pathlib
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

root = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))
sys.path.insert(0, str(root / "tests"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rung", default="flagship")
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--batches", default="1,2,4,8")
    args = p.parse_args(argv)

    import numpy as np
    from moonshine_tpu.integrator.path import PathConfig
    from moonshine_tpu.render.camera import LensArrays
    from moonshine_tpu.render import renderer

    if args.rung == "flagship":
        from __graft_entry__ import _flagship_scene
        scene, lens = _flagship_scene()
        cfg = PathConfig(max_bounces=4, env_samples_per_bounce=1,
                         mesh_samples_per_bounce=1)
    elif args.rung == "room":
        from moonshine_tpu.scene.procedural import room_scene
        world, lens = room_scene(grid=6, subdivisions=4)
        scene = world.build()
        cfg = PathConfig(max_bounces=4, env_samples_per_bounce=1,
                         mesh_samples_per_bounce=1)
    elif args.rung == "mirror_glass":
        from fixtures import icosphere
        from moonshine_tpu.scene.types import (
            Geometry, Glass, Instance, Lambert, Lens, MaterialInfo, Mesh,
            Mirror, identity_transform, translate,
        )
        from moonshine_tpu.scene.world import World
        w = World()
        sphere = w.add_mesh(icosphere(4))
        floor = w.add_mesh(Mesh(
            positions=np.float32([[-20, -20, -1], [20, -20, -1],
                                  [20, 20, -1], [-20, 20, -1]]),
            indices=np.uint32([[0, 1, 2], [0, 2, 3]])))
        mats = [w.add_material(MaterialInfo(variant=Mirror())),
                w.add_material(MaterialInfo(variant=Glass(ior=1.5))),
                w.add_material(MaterialInfo(variant=Lambert(color=(0.6, 0.6, 0.6))))]
        for x, m in [(-1.5, 0), (1.5, 1)]:
            w.add_instance(Instance(transform=translate(x, 0, 0),
                                    geometries=[Geometry(sphere, mats[m])]))
        w.add_instance(Instance(transform=identity_transform(),
                                geometries=[Geometry(floor, mats[2])]))
        sky = np.zeros((64, 128, 3), np.float32)
        sky[:, :, :] = 0.2
        sky[8:16, 20:40] = 12.0
        w.set_background(sky, size=64)
        scene = w.build()
        lens = Lens(origin=np.float32([0, -3, 0]),
                    forward=np.float32([0, 1, 0]),
                    up=np.float32([0, 0, 1]), vfov=np.pi / 4)
        cfg = PathConfig(max_bounces=8, env_samples_per_bounce=1,
                         mesh_samples_per_bounce=0)
    else:
        raise SystemExit(f"unknown rung {args.rung}")

    la = LensArrays.from_lens(lens)
    H = W = 512
    spp = args.spp

    def timed(fn):
        img, rays = fn(0)
        img.block_until_ready()
        t0 = time.perf_counter()
        img, rays = fn(spp)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        return float(rays) / dt / 1e6, dt, np.asarray(img)

    mr, dt, ref = timed(lambda s: renderer._render_spp_band(
        scene, la, H, W, 0, s, spp, cfg, True, band_h=H))
    print(f"fused           : {mr:8.3f} Mrays/s  ({dt:.3f}s)", flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        if b > spp:
            continue
        mr, dt, img = timed(lambda s, b=b: renderer._render_spp_staged(
            scene, la, H, W, s, spp, cfg, True, batch=b))
        diff = float(np.abs(img - ref).max())
        print(f"staged batch={b:<3}: {mr:8.3f} Mrays/s  ({dt:.3f}s)"
              f"  maxdiff={diff:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
