"""On-device validation: cross-checks every traversal path on real TPU.

The CPU test suite runs the packet kernels in interpret mode, which skips
the TPU-only machinery (SMEM row staging, DMA prefetch, HBM streaming).
This script validates that machinery on the attached chip:

  1. VMEM packet kernel vs the jnp while-loop oracle (closest hit)
  2. HBM-streaming kernel vs the VMEM kernel (closest + any hit),
     exercising the double-buffered DMA pipeline on the same scene
  3. per-bounce lane-state resort produces bit-identical images

Prints one PASS/FAIL line per check; exits nonzero on any failure.
"""

import os as _os
import pathlib as _pl
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(_pl.Path(__file__).resolve().parent.parent / ".jax_cache"))


import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from fixtures import icosphere
    from moonshine_tpu.accel import lbvh, packet, traverse, wide as wide_bvh
    from moonshine_tpu.core.mathutil import INF_T

    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
        failures += 0 if ok else 1

    rs = np.random.RandomState(0)
    sph = icosphere(3, with_normals=False)
    tv = sph.positions[np.asarray(sph.indices).reshape(-1, 3)]
    verts = np.concatenate(
        [tv * (0.5 + rs.rand()) + rs.randn(3) * 3 for _ in range(8)]
    ).astype(np.float32)
    binary = lbvh.build(verts, as_numpy=True)
    w = wide_bvh.build_wide(verts, binary=binary)

    N = 20000
    o = rs.randn(N, 3).astype(np.float32) * 4
    d = rs.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    ref = traverse.closest_hit(
        lbvh.device_bvh(binary), jnp.asarray(verts[np.asarray(binary.tri_order)]),
        o, d, INF_T,
    )
    vm = packet.closest_hit_packet(w, o, d, INF_T)
    diff = float(np.abs(np.asarray(ref.t) - np.asarray(vm.t)).max())
    check("vmem kernel vs jnp oracle (closest t)", diff < 1e-4,
          f"max|dt|={diff:.2e}")

    hb = packet.closest_hit_packet_hbm(w, o, d, INF_T)
    same_t = np.allclose(np.asarray(vm.t), np.asarray(hb.t))
    same_tri = bool((np.asarray(vm.tri) == np.asarray(hb.tri)).all())
    check("hbm kernel vs vmem kernel (closest)", same_t and same_tri)

    occ_vm = np.asarray(packet.any_hit_packet(w, o, d, 8.0))
    occ_hb = np.asarray(packet.any_hit_packet_hbm(w, o, d, 8.0))
    check("hbm kernel vs vmem kernel (any hit)",
          bool((occ_vm == occ_hb).all()),
          f"occluded={int(occ_vm.sum())}/{N}")

    # 16-wide internal nodes: same tree content, wider arity — must agree
    # with the 8-wide kernels bit-for-bit through both residency modes
    w16 = wide_bvh.build_wide(verts, binary=binary, width=16)
    vm16 = packet.closest_hit_packet(w16, o, d, INF_T)
    ok16 = np.allclose(np.asarray(vm.t), np.asarray(vm16.t)) and bool(
        (np.asarray(vm.tri) == np.asarray(vm16.tri)).all())
    check("16-wide vmem vs 8-wide vmem (closest)", ok16)
    hb16 = packet.closest_hit_packet_hbm(w16, o, d, INF_T)
    ok16h = np.allclose(np.asarray(vm.t), np.asarray(hb16.t))
    check("16-wide hbm vs 8-wide vmem (closest)", ok16h)
    occ16 = np.asarray(packet.any_hit_packet_hbm(w16, o, d, 8.0))
    check("16-wide hbm vs 8-wide (any hit)", bool((occ_vm == occ16).all()))

    # resort bit-identity on a real render
    from moonshine_tpu.integrator import PathConfig
    from moonshine_tpu.render.camera import LensArrays
    from moonshine_tpu.render.renderer import render_sample
    from moonshine_tpu.scene.procedural import room_scene

    world, lens = room_scene(grid=3, subdivisions=3)
    scene = world.build()
    la = LensArrays.from_lens(lens)
    cfg = PathConfig(max_bounces=3, env_samples_per_bounce=1,
                     mesh_samples_per_bounce=1)
    img0, _ = render_sample(scene, la, 128, 128, 0,
                            replace(cfg, resort_bounces=False))
    img1, _ = render_sample(scene, la, 128, 128, 0,
                            replace(cfg, resort_bounces=True))
    identical = bool(np.array_equal(np.asarray(img0), np.asarray(img1)))
    check("per-bounce resort bit-identical image", identical,
          f"mean={float(np.asarray(img0).mean()):.5f}")

    # depth golden (round-4): 256², 64 spp furnace with russian roulette
    # live (max_bounces=8; RR kicks in after bounce 3). The analytic value
    # is exactly 1.0 per pixel; the 8-spp CPU goldens can't see a bias
    # that only appears at depth, this on-chip run can. ~4M paths ->
    # the mean's noise floor is ~1e-4; 1e-3 is a real-bias tripwire.
    from moonshine_tpu.render.renderer import render
    from test_furnace import furnace_world, outside_lens

    fscene = furnace_world(albedo=1.0).build()
    fsensor, _ = render(
        fscene, outside_lens(), 256, 256, spp=64,
        cfg=PathConfig(max_bounces=8, env_samples_per_bounce=0,
                       mesh_samples_per_bounce=0),
    )
    fimg = np.asarray(fsensor.image)
    fmean = float(fimg.mean())
    fvar = float(fimg.var())
    check("depth golden: 256² 64-spp furnace w/ RR mean==1",
          abs(fmean - 1.0) < 1e-3, f"mean={fmean:.6f} var={fvar:.2e}")

    print("all checks passed" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
