"""Block-size scaling of the VMEM packet kernels on incoherent rays.

Incoherent blocks traverse near-whole-tree unions regardless of width, so
wider blocks amortize the per-visit scalar work over more lanes. Measures
closest-hit + any-hit at several BLOCK widths, coherent and incoherent,
in-graph (K-looped with data dependence).
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

    perm = jax.random.permutation(jax.random.PRNGKey(0), N)
    d2 = d[perm]
    o, d, d2 = jax.block_until_ready((o, d, d2))
    wide = scene.wide

    def loop(fn, dd):
        @jax.jit
        def run(o0):
            def body(i, carry):
                oo, acc = carry
                out = fn(oo, dd)
                s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(
                    jnp.float32))
                return oo + s * 1e-30, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (o0, jnp.float32(0)))
            return acc

        return lambda: run(o)

    @jax.jit
    def empty(v):
        def body(i, c):
            return c[0] * 1.0000001, c[1] + 1.0

        return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]

    floor = timeit(lambda: empty(o))

    for block in (4096, 8192, 16384, 32768, 65536):
        packet.set_block_size(block)
        jax.clear_caches()
        try:
            dt_c = timeit(loop(
                lambda oo, dd: packet.closest_hit_packet(wide, oo, dd, 1e30),
                d))
            dt_i = timeit(loop(
                lambda oo, dd: packet.closest_hit_packet(wide, oo, dd, 1e30),
                d2))
            dt_a = timeit(loop(
                lambda oo, dd: packet.any_hit_packet(wide, oo, dd, 1e30),
                d2))
            print(f"block {block:6d}: closest coh "
                  f"{(dt_c - floor)/K*1e3:7.3f} ms | closest incoh "
                  f"{(dt_i - floor)/K*1e3:7.3f} ms | anyhit incoh "
                  f"{(dt_a - floor)/K*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"block {block:6d}: FAILED {str(e).splitlines()[0][:70]}",
                  flush=True)
    packet.set_block_size(8192)


if __name__ == "__main__":
    main()
