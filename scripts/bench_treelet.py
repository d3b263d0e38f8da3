"""A/B: treelet-scheduled vs monolithic HBM packet traversal on the room
scene (the round-3 architecture bet). Builds a true one-bounce diffuse
batch (cosine-sampled at primary hit points) — the workload class that
drives the HBM rungs — and times both dispatch paths with per-call
blocking, then optionally full renders.

Usage: python scripts/bench_treelet.py [--tris 184k|1m] [--render] [--spp N]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def diffuse_batch(scene, o, d, h0, seed=7):
    """Cosine-hemisphere bounce rays from the primary hit points."""
    N = o.shape[0]
    tri = np.clip(np.asarray(h0.tri), 0, scene.num_tris - 1)
    live = np.asarray(h0.tri) >= 0
    corners = np.asarray(scene.corner_positions(jnp.asarray(tri)))
    n = np.cross(corners[:, 0] - corners[:, 2], corners[:, 1] - corners[:, 2])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    wo = -np.asarray(d)
    n *= np.where((n * wo).sum(-1, keepdims=True) > 0, 1.0, -1.0)
    rs = np.random.RandomState(seed)
    u1, u2 = rs.rand(N), rs.rand(N)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    loc = np.stack(
        [r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1 - u1, 0))],
        -1,
    )
    t_ax = np.cross(n, np.where(np.abs(n[:, :1]) < 0.9, [1.0, 0, 0],
                                [0, 1.0, 0]))
    t_ax /= np.maximum(np.linalg.norm(t_ax, axis=-1, keepdims=True), 1e-20)
    b_ax = np.cross(n, t_ax)
    d2 = loc[:, :1] * t_ax + loc[:, 1:2] * b_ax + loc[:, 2:3] * n
    hitp = np.asarray(o) + np.asarray(d) * np.asarray(h0.t)[:, None]
    o2 = jnp.asarray(hitp + n * 1e-4, jnp.float32)
    return (jax.block_until_ready(o2),
            jax.block_until_ready(jnp.asarray(d2, jnp.float32)),
            jnp.asarray(live))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", default="184k")
    p.add_argument("--render", action="store_true")
    p.add_argument("--spp", type=int, default=2)
    args = p.parse_args()

    from moonshine_tpu.accel import packet, treelet
    from moonshine_tpu.core import rng as R
    from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
    from moonshine_tpu.render.renderer import render_spp
    from moonshine_tpu.integrator.path import PathConfig
    from moonshine_tpu.scene.procedural import room_scene

    grid, sub = (6, 4) if args.tris == "184k" else (7, 5)
    t0 = time.perf_counter()
    world, lens = room_scene(grid=grid, subdivisions=sub)
    scene = world.build()
    scene.wide.nodes.block_until_ready()
    print(f"build {time.perf_counter()-t0:.1f}s tris={scene.num_tris} "
          f"K={scene.wide.t_roots.shape[0]} "
          f"rows={scene.wide.num_nodes + scene.wide.num_leaves}", flush=True)

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
    o, d = jax.block_until_ready((o, d))
    wide = scene.wide

    h0 = jax.block_until_ready(packet.closest_hit_packet_hbm(wide, o, d, 1e30))
    o2, d2, active = diffuse_batch(scene, o, d, h0)
    print(f"diffuse batch: {int(np.asarray(active).sum())} live lanes",
          flush=True)

    ref = jax.block_until_ready(
        packet.closest_hit_packet_hbm(wide, o2, d2, 1e30, active_in=active))
    got = jax.block_until_ready(
        treelet.closest_hit_treelet(wide, o2, d2, 1e30, active_in=active))
    agree = (np.asarray(ref.tri) == np.asarray(got.tri)).mean()
    print(f"closest agree: {agree:.5f}", flush=True)

    r = {}
    r["hp"] = timeit("packet_hbm closest primary", lambda:
        packet.closest_hit_packet_hbm(wide, o, d, 1e30))
    r["tp"] = timeit("treelet closest primary", lambda:
        treelet.closest_hit_treelet(wide, o, d, 1e30))
    r["hb"] = timeit("packet_hbm closest diffuse", lambda:
        packet.closest_hit_packet_hbm(wide, o2, d2, 1e30, active_in=active))
    r["tb"] = timeit("treelet closest diffuse", lambda:
        treelet.closest_hit_treelet(wide, o2, d2, 1e30, active_in=active))
    r["hs"] = timeit("packet_hbm anyhit diffuse", lambda:
        packet.any_hit_packet_hbm(wide, o2, d2, 30.0, active_in=active))
    r["ts"] = timeit("treelet anyhit diffuse", lambda:
        treelet.any_hit_treelet(wide, o2, d2, 30.0, active_in=active))
    print(f"speedup primary {r['hp']/r['tp']:.2f}x  "
          f"diffuse {r['hb']/r['tb']:.2f}x  "
          f"shadow {r['hs']/r['ts']:.2f}x", flush=True)

    if args.render:
        cfg = PathConfig(max_bounces=4)
        img, rays = render_spp(scene, la, H, W, 0, args.spp, cfg)
        img.block_until_ready()
        t0 = time.perf_counter()
        img, rays = render_spp(scene, la, H, W, args.spp, args.spp, cfg)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"full render: {float(rays)/dt/1e6:.3f} Mrays/s  "
              f"{args.spp/dt:.3f} spp/s", flush=True)


if __name__ == "__main__":
    main()
