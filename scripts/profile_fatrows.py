"""Round-4 lever: fat rows. Scan (leaf_cap, node width) on room_184k
bounce-1 rays at HBM blk 2048, closest + anyhit, isolated dispatches
(profile_room.py methodology: K-looped with a data dependence).

Rationale: visits are ~90% fixed-cost (profile_leafslots.py), so packing
2-3x payload per 512 B row granule cuts visit counts near-linearly.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import lbvh, packet, wide
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
    INF = 1e30

    verts = np.asarray(scene.tri_verts_sorted)
    binary = lbvh.build_sah(verts, as_numpy=True)

    def bench(wtree, label):
        @jax.jit
        def run_c(o1, d1):
            def body(i, carry):
                oo, dd = carry
                hit = packet._sorted_dispatch(
                    packet._closest_impl, wtree, oo, dd, INF, act1,
                    False, True)
                return oo, dd + hit.t[:, None] * 1e-9
            return jax.lax.fori_loop(0, K, body, (o1, d1))

        @jax.jit
        def run_a(o1, d1):
            def body(i, carry):
                oo, dd = carry
                occ = packet._sorted_dispatch(
                    packet._anyhit_impl, wtree, oo, dd, INF, act1,
                    False, True)
                return oo, dd + occ[:, None].astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, K, body, (o1, d1))

        tc = timeit(lambda: run_c(o1, d1)) / K
        ta = timeit(lambda: run_a(o1, d1)) / K
        print(f"{label:<30} closest {tc*1e3:7.2f} ms   anyhit {ta*1e3:7.2f} ms",
              flush=True)

    for cap, width in [(8, 16), (12, 16), (16, 16), (24, 16),
                       (16, 24), (24, 24), (16, 32), (24, 32)]:
        wtree = wide.build_wide(verts, binary=binary, leaf_cap=cap,
                                width=width)
        label = (f"cap={cap:2d} w={width:2d} "
                 f"L={wtree.num_leaves} M={wtree.num_nodes}")
        bench(wtree, label)


if __name__ == "__main__":
    main()
