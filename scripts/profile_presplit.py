"""Round-4 lever: SBVH spatial splits (lbvh.presplit_refs).

Measures, on room_184k bounce-1 rays at the production HBM dispatch:
  * visit counts (total / internal / leaf) presplit OFF vs ON
  * isolated closest + anyhit times (profile_room.py methodology)
across presplit budgets. The room's ~12 wall/floor triangles hold 54% of
the summed box area (each up to 1/3 of the scene), so their leaf boxes
span the room and every block's union pays for them — the classic
spatial-split target.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# the scene build must NOT presplit: scene.tri_verts_sorted would then be
# the expanded (duplicated) reference array and every tree below would be
# built over duplicated triangles
os.environ["MSN_PRESPLIT"] = "0"

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import lbvh, packet, wide
from moonshine_tpu.core import rng as R
from moonshine_tpu.core.sortutil import sort_lanes
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

    # pre-sorted rays (production order) for the visit counter
    key = packet._sort_key(scene.wide, o1, d1, act1)
    t_eff = jnp.where(act1, INF, packet._NEG)
    iota = jnp.arange(o1.shape[0], dtype=jnp.int32)
    _, (iota_s, o_s, d_s, t_s) = sort_lanes(key, [iota, o1, d1, t_eff])

    def run(label, wtree):
        hit, cnt = jax.jit(lambda o_, d_, t_: packet._closest_impl(
            wtree, o_, d_, t_, None, False, True, count_visits=True
        ))(o_s, d_s, t_s)
        cnt = np.asarray(cnt)
        tot = int(cnt[:, 0, 0].sum())
        internal = int(cnt[:, 1, 0].sum())

        @jax.jit
        def run_c(o1, d1):
            def body(i, carry):
                oo, dd = carry
                h = packet._sorted_dispatch(
                    packet._closest_impl, wtree, oo, dd, INF, act1,
                    False, True)
                return oo, dd + h.t[:, None] * 1e-9
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
        print(f"{label:<26} visits {tot:7d} (int {internal:6d} leaf "
              f"{tot - internal:6d})  closest {tc*1e3:7.2f} ms  "
              f"anyhit {ta*1e3:7.2f} ms", flush=True)

    bvh0 = lbvh.build_sah(verts, as_numpy=True)
    w0 = wide.build_wide(verts, binary=bvh0, leaf_cap=8, width=16)
    run("presplit OFF", w0)

    for factor in (1.1, 1.3, 1.6):
        refs = lbvh.presplit_refs(verts, max_refs_factor=factor)
        bvh, cl, ch = lbvh.build_sah(verts, as_numpy=True, refs=refs)
        wt = wide.build_wide(verts, binary=bvh, leaf_cap=8, width=16,
                             clip_sorted=(cl, ch))
        run(f"presplit x{factor} R={len(refs[0])}", wt)


if __name__ == "__main__":
    main()
