"""Round-4 design probe: is a leaf visit vector-ALU-bound or
fixed-cost-bound?

Builds room_184k with leaf_cap=4 (every leaf row at most half full), then
times the HBM kernel intersecting all 8 slots vs only the occupied 4 —
same tree, same visits, same DMA bytes, half the leaf Moller-Trumbore
vector work. The gap is the leaf vector-ALU share of traversal; the
remainder is fixed per-visit cost (stack ops, DMA reconcile, loop
control) + internal visits. Decides whether 16-triangle compressed leaf
rows (half the visits, double the per-visit vector work) can win.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import packet, wide
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


def bench_closest(fn, o1, d1, label):
    @jax.jit
    def run(o1, d1):
        def body(i, carry):
            oo, dd = carry
            hit = fn(oo, dd)
            return oo, dd + hit.t[:, None] * 1e-9
        return jax.lax.fori_loop(0, K, body, (o1, d1))
    dt = timeit(lambda: run(o1, d1)) / K
    print(f"{label:<52} {dt*1e3:8.2f} ms", flush=True)
    return dt


def bench_anyhit(fn, o1, d1, label):
    @jax.jit
    def run(o1, d1):
        def body(i, carry):
            oo, dd = carry
            occ = fn(oo, dd)
            return oo, dd + occ[:, None].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, K, body, (o1, d1))
    dt = timeit(lambda: run(o1, d1)) / K
    print(f"{label:<52} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()

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
    cfg = P.PathConfig(max_bounces=4)
    st1 = jax.block_until_ready(jax.jit(
        lambda s: P._bounce_body(scene, cfg, jnp.asarray(0, jnp.int32), s)
    )(dict(st0)))
    o1, d1, act1 = st1["o"], st1["d"], st1["active"]

    # half-occupancy tree: same rows, 4 real triangles per leaf
    verts = np.asarray(scene.tri_verts_sorted)
    # unsorted order doesn't matter for this probe; rebuild from scratch
    w4 = wide.build_wide(verts, leaf_cap=4, width=16)
    print(f"leaf_cap=4 tree: nodes {w4.nodes.shape} leaves {w4.leaves.shape}",
          flush=True)
    INF = 1e30

    def run_pair(slots):
        packet._LEAF_SLOTS_OVERRIDE = slots
        try:
            c = bench_closest(
                lambda o_, d_: packet._sorted_dispatch(
                    packet._closest_impl, w4, o_, d_, INF, act1, False, True),
                o1, d1, f"closest hbm blk={packet.HBM_BLOCK} slots={slots}")
            a = bench_anyhit(
                lambda o_, d_: packet._sorted_dispatch(
                    packet._anyhit_impl, w4, o_, d_, INF, act1, False, True),
                o1, d1, f"anyhit  hbm blk={packet.HBM_BLOCK} slots={slots}")
        finally:
            packet._LEAF_SLOTS_OVERRIDE = None
        return c, a

    c8, a8 = run_pair(8)
    c4, a4 = run_pair(4)
    print(f"leaf vector share (closest): {(c8-c4)/c8*200:.0f}% of runtime "
          f"would be the 8-slot leaf ALU")
    print(f"leaf vector share (anyhit):  {(a8-a4)/a8*200:.0f}%")


if __name__ == "__main__":
    main()
