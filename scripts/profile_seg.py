"""Decompose one flagship bounce segment in-graph: full vs NEE-off vs
last-segment, plus incoherent-direction variants, to locate the glue the
per-stage profile (profile_bounce2.py) can't see.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
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

    # incoherent state: scramble directions (post-diffuse-bounce regime)
    perm = jax.random.permutation(jax.random.PRNGKey(0), N)
    st1 = dict(st0)
    st1["d"] = st0["d"][perm]
    st1 = jax.block_until_ready(st1)

    def loop(cfg, st, bounce=1, last=False):
        @jax.jit
        def run(s):
            def body(i, carry):
                s2 = P._bounce_body(scene, cfg, jnp.asarray(bounce, jnp.int32),
                                    carry, last=last)
                # keep lanes alive + data-dependent so nothing folds
                s2["active"] = carry["active"]
                s2["o"] = carry["o"]
                s2["d"] = carry["d"] + s2["radiance"] * 1e-30
                s2["throughput"] = carry["throughput"]
                s2["radiance"] = carry["radiance"]
                return s2

            return jax.lax.fori_loop(0, K, body, s)["d"]

        return lambda: run(st)

    @jax.jit
    def empty(s):
        def body(i, c):
            return c * 1.0000001

        return jax.lax.fori_loop(0, K, body, s["d"])

    floor = timeit(lambda: empty(st0))

    def report(name, dt):
        print(f"{name:46s} {(dt - floor)/K*1e3:8.3f} ms", flush=True)

    full = P.PathConfig(max_bounces=4)
    nonee = P.PathConfig(max_bounces=4, env_samples_per_bounce=0,
                         mesh_samples_per_bounce=0)
    envonly = P.PathConfig(max_bounces=4, mesh_samples_per_bounce=0)
    meshonly = P.PathConfig(max_bounces=4, env_samples_per_bounce=0)

    report("bounce full (coherent)", timeit(loop(full, st0)))
    report("bounce full (incoherent)", timeit(loop(full, st1)))
    report("bounce NEE off (coherent)", timeit(loop(nonee, st0)))
    report("bounce NEE off (incoherent)", timeit(loop(nonee, st1)))
    report("bounce env-NEE only (coherent)", timeit(loop(envonly, st0)))
    report("bounce mesh-NEE only (coherent)", timeit(loop(meshonly, st0)))
    report("bounce last=True (coherent)", timeit(loop(full, st0, last=True)))


if __name__ == "__main__":
    main()
