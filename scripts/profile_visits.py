"""Visit-count instrumentation: how many BVH rows does each block traverse
on the room scene's diffuse-bounce workload, monolithic vs treelet-
scheduled? This is the union-inefficiency measurement that decides the
traversal architecture (BASELINE.md round-3)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_treelet import diffuse_batch


def main():
    from moonshine_tpu.accel import packet, treelet
    from moonshine_tpu.core import rng as R
    from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
    from moonshine_tpu.scene.procedural import room_scene

    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
    wide = scene.wide
    print(f"tris={scene.num_tris} K={wide.t_roots.shape[0]} "
          f"rows={wide.num_nodes + wide.num_leaves}", flush=True)

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
    h0 = jax.block_until_ready(packet.closest_hit_packet_hbm(wide, o, d, 1e30))
    o2, d2, active = diffuse_batch(scene, o, d, h0)

    for name, (oo, dd, act) in (("primary", (o, d, None)),
                                ("diffuse", (o2, d2, active))):
        # monolithic, with its production sort
        perm, _ = packet._sort_perm(wide, oo, dd, act)
        act_p = None if act is None else act[perm]
        hit, cnt = jax.jit(
            packet._closest_impl,
            static_argnames=("interpret", "hbm", "count_visits"),
        )(wide, oo[perm], dd[perm], 1e30, act_p, False, True,
          count_visits=True)
        cnt = np.asarray(jax.block_until_ready(cnt))[:, 0, 0].ravel()
        print(f"mono {name}: blocks={len(cnt)} visits total={cnt.sum()} "
              f"mean={cnt.mean():.0f} max={cnt.max()}", flush=True)

        # treelet
        tmax_vec = jnp.full((N,), 1e30, jnp.float32)
        if act is not None:
            tmax_vec = jnp.where(act, tmax_vec, packet._NEG)

        @jax.jit
        def trl(oo, dd, tmax_vec):
            pend, nearest = treelet._pending_masks(wide, oo, dd, tmax_vec)
            sub = treelet._subkey(wide, oo, dd)
            p = jnp.argsort(nearest * treelet.MAX_KEYED + sub)
            return treelet._dispatch(
                wide, oo[p], dd[p], tmax_vec[p], pend[p], nearest[p],
                any_hit=False, interpret=False, count_visits=True,
            ), pend

        (res, cnt2), pend = jax.block_until_ready(trl(oo, dd, tmax_vec))
        cnt2 = np.asarray(cnt2)[:, 0, 0].ravel()
        popc = np.unpackbits(
            np.ascontiguousarray(np.asarray(pend)).view(np.uint8), axis=1
        ).sum(axis=1)
        print(f"trl  {name}: blocks={len(cnt2)} visits total={cnt2.sum()} "
              f"mean={cnt2.mean():.0f} max={cnt2.max()} "
              f"pending/lane mean={popc.mean():.1f} max={popc.max()}",
              flush=True)


if __name__ == "__main__":
    main()
