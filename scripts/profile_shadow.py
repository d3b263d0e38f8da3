"""A/B coherence-sorting the NEE shadow batch on the flagship scene.

Round 2 rejected shadow sorting measured on mirror_glass (HDR sky whose
alias table concentrates directions — sorting couldn't help). The
flagship's env is CONSTANT, so env-NEE shadow directions are uniform
sphere samples: maximally incoherent, the regime where octant sorting
should collapse packet unions. Measures real shadow batches (env dirs
sampled per-lane from the scene env + mesh-NEE segments), looped
in-graph.
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
from moonshine_tpu.core.mathutil import INF_T, face_forward, offset_along_normal
from moonshine_tpu.integrator import path as P
from moonshine_tpu.lights.envmap import sample_envmap
from moonshine_tpu.lights.mesh_lights import sample_mesh_lights
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv

K = 30


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
    env_o = offset_along_normal(pos, face_forward(tri_frame.n, l_dir))
    env_lane = active & (l_pdf > 0.0)

    rng, r2b = R.next_float2(rng)
    md, l_pos, l_n, _, _, m_pdf, _ = jax.jit(
        lambda p, r: sample_mesh_lights(scene, p, r))(pos, r2b)
    off_l = offset_along_normal(l_pos, l_n)
    off_s = offset_along_normal(pos, face_forward(tri_frame.n, md))
    seg = off_l - off_s
    seg_len = jnp.linalg.norm(seg, axis=-1)
    seg_dir = seg / jnp.maximum(seg_len, 1e-20)[..., None]
    mesh_lane = active & (m_pdf > 0.0)

    so = jnp.concatenate([env_o, off_s])
    sd = jnp.concatenate([l_dir, seg_dir])
    st = jnp.concatenate([jnp.full((N,), INF_T), seg_len])
    sl = jnp.concatenate([env_lane, mesh_lane])
    so, sd, st, sl = jax.block_until_ready((so, sd, st, sl))
    print(f"shadow batch: {2*N} lanes, live "
          f"{int(jnp.sum(sl))}", flush=True)

    def loop(fn):
        @jax.jit
        def run(o0):
            def body(i, carry):
                oo, acc = carry
                occ = fn(oo)
                s = jnp.sum(occ.astype(jnp.float32))
                return oo + s * 1e-20, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (o0, jnp.float32(0)))
            return acc

        return lambda: run(so)

    @jax.jit
    def empty(v):
        def body(i, c):
            return c[0] * 1.0000001, c[1] + 1.0

        return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]

    floor = timeit(lambda: empty(so))

    def report(name, dt):
        print(f"{name:44s} {(dt - floor)/K*1e3:8.3f} ms", flush=True)

    report("anyhit unsorted (current)", timeit(loop(
        lambda oo: packet.any_hit_packet(scene.wide, oo, sd, st, sl))))
    report("anyhit sorted (octant+cell)", timeit(loop(
        lambda oo: packet.any_hit_packet(scene.wide, oo, sd, st, sl,
                                         sort=True))))
    # env-only batch (the incoherent half)
    eo = jax.block_until_ready(env_o)

    def loop_env(sort):
        @jax.jit
        def run(o0):
            def body(i, carry):
                oo, acc = carry
                occ = packet.any_hit_packet(
                    scene.wide, oo, l_dir, jnp.full((N,), INF_T), env_lane,
                    sort=sort)
                s = jnp.sum(occ.astype(jnp.float32))
                return oo + s * 1e-20, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (o0, jnp.float32(0)))
            return acc

        return lambda: run(eo)

    report("env-only unsorted (262k)", timeit(loop_env(False)))
    report("env-only sorted (262k)", timeit(loop_env(True)))


if __name__ == "__main__":
    main()
