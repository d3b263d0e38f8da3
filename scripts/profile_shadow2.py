"""Sort-key shootout for the env-NEE shadow any-hit batch.

profile_shadow.py showed the current cell-major/octant-minor key does not
help shadow rays. Hypothesis: with 4^3 cells x 8 octants and ~1k lanes per
bucket, each 8192-lane block covers ONE cell x ALL EIGHT octants — for
direction-dominant workloads (env shadow rays mostly escape the scene) the
block union never shrinks. Octant-major keys should fix that. Measures the
real flagship env shadow batch under several key orders.
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
from moonshine_tpu.core.sortutil import sort_lanes
from moonshine_tpu.core.mathutil import INF_T, face_forward, offset_along_normal
from moonshine_tpu.integrator import path as P
from moonshine_tpu.lights.envmap import sample_envmap
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

    hit = packet.closest_hit_packet(scene.wide, o, d, 1e30)
    tri = jnp.clip(hit.tri, 0, scene.num_tris - 1)
    pos, _, tri_frame, _, _, _ = jax.jit(
        lambda t, u, v: P._decode_hit(scene, t, u, v))(tri, hit.u, hit.v)
    active = hit.tri >= 0

    rng, r2 = R.next_float2(rng)
    l_dir, _, l_pdf = jax.jit(lambda r: sample_envmap(scene.env, r))(r2)
    so = offset_along_normal(pos, face_forward(tri_frame.n, l_dir))
    sd = l_dir
    lane = active & (l_pdf > 0.0)
    st = jnp.where(lane, INF_T, packet._NEG)
    so, sd, st = jax.block_until_ready((so, sd, st))
    print(f"env shadow batch: {N} lanes, live {int(jnp.sum(lane))}",
          flush=True)

    wide = scene.wide
    lo = wide.bounds[0]
    inv_ext = 1.0 / jnp.maximum(wide.bounds[1] - lo, 1e-20)

    def keyed(key_fn):
        @jax.jit
        def run(o0):
            def body(i, carry):
                oo, acc = carry
                key = key_fn(oo, sd)
                key = jnp.where(st > 0, key, jnp.int32(1 << 20))
                _, (o_s, d_s, t_s) = sort_lanes(key, [oo, sd, st])
                occ = packet.any_hit_packet(wide, o_s, d_s, t_s)
                s = jnp.sum(occ.astype(jnp.float32))
                return oo + s * 1e-30, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (o0, jnp.float32(0)))
            return acc

        return lambda: run(so)

    @jax.jit
    def unsorted(o0):
        def body(i, carry):
            oo, acc = carry
            occ = packet.any_hit_packet(wide, oo, sd, st)
            s = jnp.sum(occ.astype(jnp.float32))
            return oo + s * 1e-30, acc + s

        _, acc = jax.lax.fori_loop(0, K, body, (o0, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(v):
        def body(i, c):
            return c[0] * 1.0000001, c[1] + 1.0

        return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]

    floor = timeit(lambda: empty(so))

    def report(name, dt):
        print(f"{name:46s} {(dt - floor)/K*1e3:8.3f} ms", flush=True)

    def cell_of(oo, bits):
        n = 1 << bits
        return jnp.clip(((oo - lo) * inv_ext * n).astype(jnp.int32), 0, n - 1)

    def octant_of(dd):
        return ((dd[:, 0] > 0).astype(jnp.int32) * 4
                + (dd[:, 1] > 0).astype(jnp.int32) * 2
                + (dd[:, 2] > 0).astype(jnp.int32))

    def dgrid_of(dd, bits):
        n = 1 << bits
        g = jnp.clip(((dd + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1)
        return (g[:, 0] * n + g[:, 1]) * n + g[:, 2]

    report("unsorted (tile-major, current)", timeit(lambda: unsorted(so)))

    def k_cell_oct(oo, dd):  # current _sort_key
        c = cell_of(oo, 2)
        return ((c[:, 0] * 4 + c[:, 1]) * 4 + c[:, 2]) * 8 + octant_of(dd)

    report("cell(4^3)-major, octant-minor", timeit(keyed(k_cell_oct)))

    def k_oct_cell(oo, dd):
        c = cell_of(oo, 2)
        return octant_of(dd) * 64 + (c[:, 0] * 4 + c[:, 1]) * 4 + c[:, 2]

    report("octant-major, cell(4^3)-minor", timeit(keyed(k_oct_cell)))

    def k_dgrid(oo, dd):
        c = cell_of(oo, 2)
        return dgrid_of(dd, 2) * 64 + (c[:, 0] * 4 + c[:, 1]) * 4 + c[:, 2]

    report("dir-grid(4^3)-major, cell-minor", timeit(keyed(k_dgrid)))

    def k_dgrid_only(oo, dd):
        return dgrid_of(dd, 3)

    report("dir-grid(8^3) only", timeit(keyed(k_dgrid_only)))


if __name__ == "__main__":
    main()
