"""Knockout decomposition of the NEE-off bounce body, coherent vs
incoherent directions, to find the direction-dependent glue that
profile_seg.py exposed (3.5 ms vs 7.7 ms non-traversal cost).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from moonshine_tpu.accel import packet
from moonshine_tpu.accel.traverse import Hit
from moonshine_tpu.core import rng as R
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv

K = 20


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
    st0 = jax.block_until_ready(st0)

    perm = jax.random.permutation(jax.random.PRNGKey(0), N)
    st1 = dict(st0)
    st1["d"] = st0["d"][perm]
    st1 = jax.block_until_ready(st1)

    cfg = P.PathConfig(max_bounces=4, env_samples_per_bounce=0,
                       mesh_samples_per_bounce=0)

    def loop(st, closest=None, decode=None):
        orig_closest = P._closest
        orig_decode = P._decode_hit
        if closest is not None:
            P._closest = closest
        if decode is not None:
            P._decode_hit = decode
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
            jax.block_until_ready(f())  # compile under the patch
            return f
        finally:
            P._closest = orig_closest
            P._decode_hit = orig_decode

    @jax.jit
    def empty(s):
        def body(i, c):
            return c * 1.0000001

        return jax.lax.fori_loop(0, K, body, s["d"])

    floor = timeit(lambda: empty(st0))

    def report(name, dt):
        print(f"{name:52s} {(dt - floor)/K*1e3:8.3f} ms", flush=True)

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

    for name, st in (("coherent", st0), ("incoherent", st1)):
        report(f"NEE-off full ({name})", timeit(loop(st)))
        report(f"  - closest fixed ({name})", timeit(loop(st, closest=fixed_closest)))
        report(f"  - closest+decode fixed ({name})",
               timeit(loop(st, closest=fixed_closest, decode=fixed_decode)))
        report(f"  - decode fixed only ({name})",
               timeit(loop(st, decode=fixed_decode)))


if __name__ == "__main__":
    main()
