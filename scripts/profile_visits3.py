"""Visit decomposition: internal vs leaf visits per block, plus per-visit
wall time, on the room scene's bounce-1 workload (closest + any-hit).

Decides the next traversal lever: 16-wide internal nodes halve internal
visits; 16-triangle leaf rows halve leaf visits. Both trade 2x per-visit
scalar row reads for half the per-visit fixed overhead (loop control, DMA
reconcile, cond dispatch, stack maintenance), so the win is bounded by
which visit kind dominates.
"""

import os as _os
import pathlib as _pl
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(_pl.Path(__file__).resolve().parent.parent / ".jax_cache"))


import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import packet
from moonshine_tpu.core import rng as R
from moonshine_tpu.core.sortutil import sort_lanes
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
from moonshine_tpu.scene.procedural import room_scene


def timed(fn, *args, n=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args, **kw))
    return out, (time.perf_counter() - t0) / n


def main():
    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
    wide = scene.wide
    print(f"tris={scene.num_tris} nodes={wide.num_nodes} "
          f"leaves={wide.num_leaves}", flush=True)

    la = LensArrays.from_lens(lens)
    H = W = 512
    N = H * W
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap = R.next_float2(rng)
    o, d = generate_rays(la, W, H, uv, ap)
    st0 = jax.jit(P._init_state)(o, d, rng)
    st1 = jax.jit(
        lambda s: P._bounce_body(scene, P.PathConfig(max_bounces=4),
                                 jnp.asarray(0, jnp.int32), s)
    )(dict(st0))
    st1 = jax.block_until_ready(st1)

    o1, d1, act = st1["o"], st1["d"], st1["active"]
    key = packet._sort_key(wide, o1, d1, act)
    t_eff = jnp.where(act, 1e30, packet._NEG)
    _, (o_s, d_s, t_s) = sort_lanes(key, [o1, d1, t_eff])

    for name, impl in (("closest", packet._closest_impl),
                       ("anyhit ", packet._anyhit_impl)):
        fn = jax.jit(impl,
                     static_argnames=("interpret", "hbm", "count_visits"))
        (res, cnt), dt = timed(
            fn, wide, o_s, d_s, t_s, None, False, True, count_visits=True)
        cnt = np.asarray(cnt)
        tot = cnt[:, 0, 0].astype(np.int64)
        internal = cnt[:, 1, 0].astype(np.int64)
        leaf = tot - internal
        # timed run re-dispatches with count_visits for identical traversal;
        # also time the plain kernel for the honest per-visit cost
        _, dt_plain = timed(fn, wide, o_s, d_s, t_s, None, False, True,
                            count_visits=False)
        print(f"{name}: blocks={len(tot)} visits={tot.sum()} "
              f"internal={internal.sum()} ({100*internal.sum()/tot.sum():.0f}%) "
              f"leaf={leaf.sum()} time={dt_plain*1e3:.2f}ms "
              f"ns/visit={dt_plain/tot.sum()*1e9:.0f}", flush=True)


if __name__ == "__main__":
    main()
