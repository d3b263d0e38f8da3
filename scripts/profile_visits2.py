"""Visit counts: closest vs any-hit on identical bounce-1 room rays.

profile_room.py measured any-hit at 5x the closest-hit cost on the same
incoherent rays. Same kernel body scale, so the gap must be visits —
this prints per-block visit totals for both, on identically sorted rays.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import packet
from moonshine_tpu.core import rng as R
from moonshine_tpu.core.sortutil import sort_lanes
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
from moonshine_tpu.scene.procedural import room_scene


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

    hit, cnt_c = jax.jit(
        packet._closest_impl,
        static_argnames=("interpret", "hbm", "count_visits"),
    )(wide, o_s, d_s, t_s, None, False, True, count_visits=True)
    cnt_c = np.asarray(jax.block_until_ready(cnt_c))[:, 0, 0].ravel()
    print(f"closest: blocks={len(cnt_c)} visits={cnt_c.sum()} "
          f"mean={cnt_c.mean():.0f} max={cnt_c.max()}", flush=True)

    occ, cnt_a = jax.jit(
        packet._anyhit_impl,
        static_argnames=("interpret", "hbm", "count_visits"),
    )(wide, o_s, d_s, t_s, None, False, True, count_visits=True)
    cnt_a = np.asarray(jax.block_until_ready(cnt_a))[:, 0, 0].ravel()
    print(f"anyhit : blocks={len(cnt_a)} visits={cnt_a.sum()} "
          f"mean={cnt_a.mean():.0f} max={cnt_a.max()} "
          f"occluded={int(np.asarray(occ).sum())}/{N}", flush=True)


if __name__ == "__main__":
    main()
