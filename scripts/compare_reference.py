"""Reference-image comparison harness (BASELINE.json metric: "image RMSE
vs reference").

Renders BASELINE.md ladder configs 1-2 (furnace 256^2, Cornell 512^2)
through this engine and reports per-image mean / variance / RMSE against:

  1. analytic ground truth where it exists (the furnace identity: an
     albedo-1 Lambert sphere inside a unit environment integrates to
     exactly 1.0 at every pixel — the reference's own acceptance test,
     engine/tests.zig:257-345);
  2. a reference-rendered EXR, when one is supplied via --ref-furnace /
     --ref-cornell. The reference (Zig + Vulkan RT + DXC) does not build
     in this environment — no zig toolchain, no Vulkan loader, no DXC —
     so reference EXRs must be rendered on a Vulkan-capable machine with
     `zig build run-offline` and checked in / passed here. Channel note:
     assets with spec-packed metallic-roughness will shade differently
     unless the world was loaded with spec_channels=False (the reference
     reads metallic from the red channel, World.zig:173-175; see
     scene/gltf.py).

Usage:
  python scripts/compare_reference.py [--spp-furnace 64] [--spp-cornell 64]
      [--ref-furnace ref.exr] [--ref-cornell ref.exr] [--out-dir DIR]

Prints one JSON line per config; writes our renders as EXRs when
--out-dir is given (so they can serve as pinned goldens).
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def stats(img):
    return {
        "mean": round(float(img.mean()), 6),
        "var": round(float(img.var()), 6),
        "min": round(float(img.min()), 6),
        "max": round(float(img.max()), 6),
    }


def rmse(a, b):
    return round(float(np.sqrt(np.mean((a - b) ** 2))), 6)


def render(scene, lens, h, w, spp, cfg):
    from moonshine_tpu.render.camera import LensArrays
    from moonshine_tpu.render.renderer import render_spp

    img, _ = render_spp(scene, LensArrays.from_lens(lens), h, w, 0, spp, cfg)
    return np.asarray(img) / spp  # render_spp returns the radiance sum


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--spp-furnace", type=int, default=64)
    p.add_argument("--spp-cornell", type=int, default=64)
    p.add_argument("--ref-furnace", default=None)
    p.add_argument("--ref-cornell", default=None)
    p.add_argument("--out-dir", default=None)
    args = p.parse_args(argv)

    from fixtures import icosphere
    from glb_builder import cornell_box_glb
    from moonshine_tpu.integrator import PathConfig
    from moonshine_tpu.io.exr import read_exr, write_exr
    from moonshine_tpu.scene import gltf
    from moonshine_tpu.scene.types import (
        Geometry, Instance, Lambert, Lens, MaterialInfo, identity_transform,
    )
    from moonshine_tpu.scene.world import World

    out_dir = pathlib.Path(args.out_dir) if args.out_dir else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
    results = []

    # --- config 1: furnace, 256^2 (analytic truth: every pixel == 1.0) ---
    w = World()
    mesh = w.add_mesh(icosphere(3, with_normals=False))
    mat = w.add_material(MaterialInfo(variant=Lambert(color=(1, 1, 1))))
    w.add_instance(Instance(transform=identity_transform(),
                            geometries=[Geometry(mesh, mat)]))
    w.set_background(None)
    lens = Lens(origin=np.float32([0, -3, 0]), forward=np.float32([0, 1, 0]),
                up=np.float32([0, 0, 1]), vfov=np.pi / 4)
    t0 = time.perf_counter()
    img = render(w.build(), lens, 256, 256, args.spp_furnace,
                 PathConfig(max_bounces=64, env_samples_per_bounce=0,
                            mesh_samples_per_bounce=0, unroll=False))
    r = {"config": "furnace_256", "spp": args.spp_furnace,
         "seconds": round(time.perf_counter() - t0, 2), "ours": stats(img),
         "rmse_vs_analytic": rmse(img, np.ones_like(img)),
         "max_abs_err_vs_analytic": round(float(np.abs(img - 1.0).max()), 6)}
    if args.ref_furnace:
        ref = read_exr(args.ref_furnace)[..., :3]
        r["ref"] = stats(ref)
        r["rmse_vs_reference"] = rmse(img, ref)
    if out_dir:
        write_exr(out_dir / "furnace_256.exr", img)
    results.append(r)
    print(json.dumps(r), flush=True)

    # --- config 2: Cornell box, 512^2, NEE+MIS ---
    world = gltf.world_from_glb(cornell_box_glb())
    world.set_background(np.zeros((4, 8, 3), np.float32))
    clens = gltf.lens_from_glb(cornell_box_glb())
    t0 = time.perf_counter()
    img = render(world.build(), clens, 512, 512, args.spp_cornell,
                 PathConfig(max_bounces=4, env_samples_per_bounce=0,
                            mesh_samples_per_bounce=1))
    r = {"config": "cornell_512", "spp": args.spp_cornell,
         "seconds": round(time.perf_counter() - t0, 2), "ours": stats(img)}
    if args.ref_cornell:
        ref = read_exr(args.ref_cornell)[..., :3]
        r["ref"] = stats(ref)
        r["rmse_vs_reference"] = rmse(img, ref)
        r["mean_abs_diff"] = round(float(np.abs(img - ref).mean()), 6)
    if out_dir:
        write_exr(out_dir / "cornell_512.exr", img)
    results.append(r)
    print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
