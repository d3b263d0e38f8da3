"""Per-stage timing of the flagship bench on the attached TPU.

Times, in isolation: primary closest-hit packet dispatch, shadow any-hit
dispatch, one full bounce segment, and the full render_sample, to show
where the per-sample wall time goes.
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
from moonshine_tpu.integrator.path import PathConfig, trace_paths
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
from moonshine_tpu.render.renderer import render_sample


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        # block every call: with async dispatch, timing only the last
        # wait has produced wildly under-read numbers on this tunnel
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    scene, lens = _flagship_scene()
    lens_arrays = LensArrays.from_lens(lens)
    H, W = 512, 512
    N = H * W
    cfg = PathConfig(max_bounces=4)

    wide = scene.wide
    print(f"scene: tris={scene.num_tris} wide nodes={wide.num_nodes} "
          f"leaves={wide.num_leaves} fits_vmem={packet.fits_vmem(wide)}")

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap = R.next_float2(rng)
    o, d = generate_rays(lens_arrays, W, H, uv, ap)
    o, d = jax.block_until_ready((o, d))

    timeit("closest_hit primary (262k)", lambda: packet.closest_hit_packet(
        wide, o, d, 1e30))

    # incoherent directions: reuse primary origins with scrambled dirs
    perm = jax.random.permutation(jax.random.PRNGKey(0), N)
    d2 = d[perm]
    d2 = jax.block_until_ready(d2)
    timeit("closest_hit incoherent (262k)", lambda: packet.closest_hit_packet(
        wide, o, d2, 1e30))

    o3 = jnp.concatenate([o, o])
    d3 = jnp.concatenate([d, d2])
    timeit("any_hit shadow-ish (524k)", lambda: packet.any_hit_packet(
        wide, o3, d3, 1e30))

    timeit("trace_paths mb=0 (1 seg)", lambda: trace_paths(
        scene, o, d, rng, PathConfig(max_bounces=0))[0], n=3)
    timeit("trace_paths mb=1 (2 seg)", lambda: trace_paths(
        scene, o, d, rng, PathConfig(max_bounces=1))[0], n=3)
    timeit("trace_paths mb=4 (6 seg)", lambda: trace_paths(
        scene, o, d, rng, cfg)[0], n=3)
    timeit("render_sample full", lambda: render_sample(
        scene, lens_arrays, H, W, jnp.asarray(1, jnp.uint32), cfg)[0], n=3)


if __name__ == "__main__":
    main()
