"""Round-5 A/B: format-V (vector-decode) packet traversal vs the row-format
kernels on the room rungs.

Methodology = profile_room.py (K-looped fori with a real data dependence and
an empty-loop floor subtraction), both coherent primary and post-scatter
bounce-1 ray states, closest + anyhit, through the public sorted HBM
wrappers the integrator actually calls. --full adds the 1M-tri room.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from moonshine_tpu.accel import packet, vpacket
from moonshine_tpu.core import rng as R
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
from moonshine_tpu.scene.procedural import room_scene

K = 10


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def ray_states(scene, lens):
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
    st0 = jax.block_until_ready(jax.jit(P._init_state)(o, d, rng))
    cfg = P.PathConfig(max_bounces=4)
    st1 = jax.block_until_ready(jax.jit(
        lambda s: P._bounce_body(scene, cfg, jnp.asarray(0, jnp.int32), s)
    )(dict(st0)))
    return st0, st1


def loop_trace(fn, st):
    @jax.jit
    def run(s):
        def body(i, carry):
            oo, acc = carry
            out = fn(oo, s["d"], s["active"])
            v = jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)
            ssum = jnp.sum(v)
            return oo + ssum * 1e-7, acc + ssum

        _, acc = jax.lax.fori_loop(0, K, body, (s["o"], jnp.float32(0)))
        return acc

    return lambda: run(st)


def bench_scene(name, grid, sub):
    world, lens = room_scene(grid=grid, subdivisions=sub)
    scene = world.build()
    w = scene.wide
    v = vpacket.v_from_wide(w)
    nbytes_row = (int(jnp.size(w.nodes)) + int(jnp.size(w.leaves))) * 4
    nbytes_v = (int(jnp.size(v.nodes)) + int(jnp.size(v.leaves))) * 4
    print(f"\n=== {name}: tris={scene.num_tris} w={w.width} cap={w.leaf_slots}"
          f" nodes={w.num_nodes} leaves={w.num_leaves}"
          f" | rows {nbytes_row/2**20:.1f} MB, V {nbytes_v/2**20:.1f} MB"
          f" (V vmem_fit={vpacket.fits_vmem(v)})", flush=True)

    st0, st1 = ray_states(scene, lens)
    print(f"bounce-1 live lanes: {int(jnp.sum(st1['active']))}", flush=True)

    @jax.jit
    def empty(s):
        def body(i, c):
            return c * 1.0000001
        return jax.lax.fori_loop(0, K, body, s["d"])

    floor = timeit(lambda: empty(st0))

    variants = {
        "row closest": lambda oo, dd, act: packet.closest_hit_packet_hbm(
            w, oo, dd, 1e30, active_in=act),
        "row anyhit": lambda oo, dd, act: packet.any_hit_packet_hbm(
            w, oo, dd, 1e30, active_in=act),
        "V closest": lambda oo, dd, act: vpacket.closest_hit_vpacket_hbm(
            v, oo, dd, 1e30, active_in=act),
        "V anyhit": lambda oo, dd, act: vpacket.any_hit_vpacket_hbm(
            v, oo, dd, 1e30, active_in=act),
    }
    out = {}
    for state_name, st in [("primary", st0), ("bounce1", st1)]:
        for vname, fn in variants.items():
            dt = (timeit(loop_trace(fn, st)) - floor) / K
            out[(state_name, vname)] = dt
            print(f"{name} {state_name:8s} {vname:12s} {dt*1e3:8.2f} ms",
                  flush=True)
    for state_name in ("primary", "bounce1"):
        for kind in ("closest", "anyhit"):
            r = out[(state_name, f"row {kind}")]
            vv = out[(state_name, f"V {kind}")]
            print(f"{name} {state_name:8s} {kind}: V/row = {vv/r:.3f}x"
                  f" ({'WIN' if vv < r else 'loss'})", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the 1M room")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    bench_scene("room_184k", 6, 4)
    if args.full:
        bench_scene("room_1M", 7, 5)


if __name__ == "__main__":
    main()
