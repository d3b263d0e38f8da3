"""Round-4 experiment: does room_184k fit (and win) as a VMEM-resident
scene if the VMEM scene budget is raised toward the chip's 16 MB?

Measures isolated closest-hit + any-hit dispatches at 262k lanes on
bounce-1 rays, HBM hybrid mode vs forced-VMEM mode, plus 8-wide vs
16-wide nodes. K-looped with a data dependence (profile_room.py
methodology).
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import packet
from moonshine_tpu.core import rng as R
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
from moonshine_tpu.scene.procedural import room_scene

K = 8


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
    wide = scene.wide
    nbytes_n = int(np.prod(wide.nodes.shape)) * 4
    nbytes_l = int(np.prod(wide.leaves.shape)) * 4
    print(f"tris={scene.num_tris} width={wide.width} "
          f"nodes={wide.nodes.shape} ({nbytes_n/1e6:.1f} MB) "
          f"leaves={wide.leaves.shape} ({nbytes_l/1e6:.1f} MB) "
          f"total={(nbytes_n+nbytes_l)/1e6:.1f} MB", flush=True)

    la = LensArrays.from_lens(lens)
    H = W = 512
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap = R.next_float2(rng)
    o, d = generate_rays(la, W, H, uv, ap)
    st0 = jax.jit(P._init_state)(o, d, rng)

    cfg_full = P.PathConfig(max_bounces=4)
    st1 = jax.jit(
        lambda s: P._bounce_body(scene, cfg_full, jnp.asarray(0, jnp.int32), s)
    )(dict(st0))
    st1 = jax.block_until_ready(st1)
    n_live = int(jnp.sum(st1["active"]))
    print(f"bounce-1 live lanes: {n_live}", flush=True)
    o1, d1, act1 = st1["o"], st1["d"], st1["active"]

    def bench_closest(fn, label):
        @jax.jit
        def run(o1, d1):
            def body(i, carry):
                oo, dd = carry
                hit = fn(oo, dd)
                return oo, dd + hit.t[:, None] * 1e-9
            return jax.lax.fori_loop(0, K, body, (o1, d1))
        try:
            dt = timeit(lambda: run(o1, d1)) / K
            print(f"{label:<42} {dt*1e3:8.2f} ms", flush=True)
            return dt
        except Exception as e:
            print(f"{label:<42} FAILED: {str(e)[:300]}", flush=True)
            return None

    def bench_anyhit(fn, label):
        @jax.jit
        def run(o1, d1):
            def body(i, carry):
                oo, dd = carry
                occ = fn(oo, dd)
                return oo, dd + occ[:, None].astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, K, body, (o1, d1))
        try:
            dt = timeit(lambda: run(o1, d1)) / K
            print(f"{label:<42} {dt*1e3:8.2f} ms", flush=True)
            return dt
        except Exception as e:
            print(f"{label:<42} FAILED: {str(e)[:300]}", flush=True)
            return None

    INF = 1e30
    # current production path: HBM hybrid, sorted
    bench_closest(
        lambda o_, d_: packet.closest_hit_packet_hbm(
            wide, o_, d_, INF, active_in=act1),
        f"closest hbm-hybrid w={wide.width} (sorted)")
    bench_anyhit(
        lambda o_, d_: packet.any_hit_packet_hbm(
            wide, o_, d_, INF, active_in=act1),
        f"anyhit  hbm-hybrid w={wide.width} (sorted)")

    # forced VMEM: raise the budget so fits_vmem would pass; dispatch the
    # VMEM kernel directly (with and without the coherence sort)
    for blk in (4096, 8192):
        packet.set_block_size(blk)
        bench_closest(
            lambda o_, d_: packet.closest_hit_packet(
                wide, o_, d_, INF, active_in=act1, sort=True),
            f"closest VMEM w={wide.width} blk={blk} (sorted)")
        bench_anyhit(
            lambda o_, d_: packet.any_hit_packet(
                wide, o_, d_, INF, active_in=act1, sort=True),
            f"anyhit  VMEM w={wide.width} blk={blk} (sorted)")
    packet.set_block_size(8192)


if __name__ == "__main__":
    main()
