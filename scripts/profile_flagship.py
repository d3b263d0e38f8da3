"""In-graph stage decomposition of the flagship bench scene (VMEM kernel).

The round-3 verdict asked for the flagship's own cost structure (the room
one is in BASELINE.md; the flagship's was not): same methodology as
profile_room.py — K-looped with a real data dependence so nothing folds.
Flagship = 512², all materials + NEE, max_bounces 4 (bench.py).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from moonshine_tpu.accel import packet
from moonshine_tpu.core import rng as R
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv

K = 10


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    scene, lens = _flagship_scene()
    la = LensArrays.from_lens(lens)
    H = W = 512
    print(f"tris={scene.num_tris} mode="
          f"{'vmem' if packet.fits_vmem(scene.wide) else 'hbm'} "
          f"w={scene.wide.width} slots={scene.wide.leaf_slots}", flush=True)

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap = R.next_float2(rng)
    o, d = generate_rays(la, W, H, uv, ap)
    st0 = jax.block_until_ready(jax.jit(P._init_state)(o, d, rng))

    cfg_full = P.PathConfig(max_bounces=4, env_samples_per_bounce=1,
                            mesh_samples_per_bounce=1)
    st1 = jax.block_until_ready(jax.jit(
        lambda s: P._bounce_body(scene, cfg_full, jnp.asarray(0, jnp.int32),
                                 s)
    )(dict(st0)))
    print(f"bounce-1 live lanes: {int(jnp.sum(st1['active']))}", flush=True)

    def loop_bounce(cfg, st, resort=False):
        @jax.jit
        def run(s):
            def body(i, carry):
                c = dict(carry)
                if resort:
                    c = P._resort_state(scene, c)
                s2 = P._bounce_body(scene, cfg, jnp.asarray(1, jnp.int32),
                                    c, resort=resort)
                s2["active"] = carry["active"]
                s2["o"] = carry["o"]
                s2["d"] = carry["d"] + s2["radiance"] * 1e-7
                s2["throughput"] = carry["throughput"]
                s2["radiance"] = carry["radiance"]
                s2["pix"] = carry["pix"]
                s2["rng"] = carry["rng"]
                return s2

            return jax.lax.fori_loop(0, K, body, s)["d"]

        return lambda: run(st)

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

    def loop_resort(st):
        @jax.jit
        def run(s):
            def body(i, carry):
                c = dict(carry)
                c = P._resort_state(scene, c)
                c["o"] = c["o"] + c["radiance"] * 1e-9
                return c

            return jax.lax.fori_loop(0, K, body, s)["o"]

        return lambda: run(dict(st))

    @jax.jit
    def empty(s):
        def body(i, c):
            return c * 1.0000001

        return jax.lax.fori_loop(0, K, body, s["d"])

    floor = timeit(lambda: empty(st0))

    def report(name, dt):
        print(f"{name:46s} {(dt - floor)/K*1e3:8.2f} ms", flush=True)

    full = cfg_full
    nonee = P.PathConfig(max_bounces=4, env_samples_per_bounce=0,
                         mesh_samples_per_bounce=0)

    closest = lambda oo, dd, act: packet.closest_hit_packet(
        scene.wide, oo, dd, 1e30, active_in=act)
    closest_s = lambda oo, dd, act: packet.closest_hit_packet(
        scene.wide, oo, dd, 1e30, active_in=act, sort=True)
    anyhit = lambda oo, dd, act: packet.any_hit_packet(
        scene.wide, oo, dd, 1e30, active_in=act)

    report("closest (primary rays)", timeit(loop_trace(closest, st0)))
    report("closest (bounce-1 rays)", timeit(loop_trace(closest, st1)))
    report("closest sorted (bounce-1 rays)",
           timeit(loop_trace(closest_s, st1)))
    report("anyhit (bounce-1 rays)", timeit(loop_trace(anyhit, st1)))
    report("resort alone (bounce-1 state)", timeit(loop_resort(st1)))
    report("bounce full+resort (bounce-1 state)",
           timeit(loop_bounce(full, st1, resort=True)))
    report("bounce full no-resort (bounce-1 state)",
           timeit(loop_bounce(full, st1)))
    report("bounce NEE-off+resort (bounce-1 state)",
           timeit(loop_bounce(nonee, st1, resort=True)))
    report("bounce NEE-off no-resort (bounce-1 state)",
           timeit(loop_bounce(nonee, st1)))


if __name__ == "__main__":
    main()
