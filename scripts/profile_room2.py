"""Knockout decomposition of the room's NEE-off bounce (profile_seg2.py
methodology): fix closest / decode / material one at a time to find the
~80 ms of non-traversal cost profile_room.py exposed.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp

from moonshine_tpu.accel.traverse import Hit
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


def main():
    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
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

    cfg = P.PathConfig(max_bounces=4, env_samples_per_bounce=0,
                       mesh_samples_per_bounce=0)

    def loop(st, closest=None, decode=None, material=None):
        orig_c, orig_d, orig_m = P._closest, P._decode_hit, P._decode_material
        if closest is not None:
            P._closest = closest
        if decode is not None:
            P._decode_hit = decode
        if material is not None:
            P._decode_material = material
        try:
            @jax.jit
            def run(s):
                def body(i, carry):
                    s2 = P._bounce_body(scene, cfg,
                                        jnp.asarray(1, jnp.int32), carry)
                    s2["active"] = carry["active"]
                    s2["o"] = carry["o"]
                    s2["d"] = carry["d"] + s2["radiance"] * 1e-7
                    s2["throughput"] = carry["throughput"]
                    s2["radiance"] = carry["radiance"]
                    return s2

                return jax.lax.fori_loop(0, K, body, s)["d"]

            jax.clear_caches()
            f = lambda: run(st)
            jax.block_until_ready(f())
            return f
        finally:
            P._closest, P._decode_hit, P._decode_material = (
                orig_c, orig_d, orig_m)

    @jax.jit
    def empty(s):
        def body(i, c):
            return c * 1.0000001

        return jax.lax.fori_loop(0, K, body, s["d"])

    floor = timeit(lambda: empty(st1))

    def report(name, dt):
        print(f"{name:46s} {(dt - floor)/K*1e3:8.2f} ms", flush=True)

    def fixed_closest(scene_, o_, d_, tm, act, presorted=False):
        n = o_.shape[0]
        tri = (jnp.arange(n, dtype=jnp.int32) % scene.num_tris)
        return Hit(t=jnp.full((n,), 3.0), tri=tri,
                   u=jnp.full((n,), 0.3), v=jnp.full((n,), 0.3))

    def fixed_decode(scene_, tri, u, v):
        n = tri.shape[0]
        from moonshine_tpu.core.frame import Frame
        pos = jnp.zeros((n, 3)) + jnp.arange(n)[:, None] * 1e-6
        uv_ = jnp.full((n, 2), 0.25)
        fr = Frame.from_normal(jnp.tile(jnp.float32([0, 0, 1]), (n, 1)))
        mat_row = jnp.tile(
            jnp.concatenate([jnp.float32([1]), jnp.full(15, 0.5)]), (n, 1))
        return pos, uv_, fr, fr, mat_row, jnp.zeros(n, bool)

    def fixed_material(scene_, mat_row, uv):
        from moonshine_tpu.bsdf import materials as B
        n = mat_row.shape[0]
        lanes = B.MaterialLanes(
            type=jnp.full((n,), 1, jnp.int32),
            color=jnp.full((n, 3), 0.5),
            metalness=jnp.zeros((n,)),
            alpha=jnp.full((n,), 0.25),
            ior=jnp.full((n,), 1.5),
        )
        return lanes, jnp.zeros((n, 3)), jnp.full((n, 2), 0.5)

    from moonshine_tpu.accel import packet as PK
    wide = scene.wide

    def direct_closest(scene_, o_, d_, tm, act, presorted=False):
        return PK.closest_hit_packet_hbm(wide, o_, d_, 1e30, active_in=act)

    def direct_nosort(scene_, o_, d_, tm, act, presorted=False):
        return PK.closest_hit_packet_hbm(wide, o_, d_, 1e30, active_in=act,
                                         sort=False)

    def direct_noactive(scene_, o_, d_, tm, act, presorted=False):
        return PK.closest_hit_packet_hbm(wide, o_, d_, 1e30)

    report("NEE-off full", timeit(loop(st1)))
    report("  closest direct (same as isolated)",
           timeit(loop(st1, closest=direct_closest)))
    report("  closest direct sort=False",
           timeit(loop(st1, closest=direct_nosort)))
    report("  closest direct active=None",
           timeit(loop(st1, closest=direct_noactive)))
    report("  closest fixed", timeit(loop(st1, closest=fixed_closest)))
    report("  decode fixed", timeit(loop(st1, decode=fixed_decode)))
    report("  material fixed", timeit(loop(st1, material=fixed_material)))
    report("  closest+decode+material fixed",
           timeit(loop(st1, closest=fixed_closest, decode=fixed_decode,
                       material=fixed_material)))


if __name__ == "__main__":
    main()
