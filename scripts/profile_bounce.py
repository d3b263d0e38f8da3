"""Piecewise timing of one integrator bounce on the flagship scene: where
do the ~200 ms/segment go? Times each stage of path._bounce_body as its
own jitted dispatch (fusion differs from the real graph, but a dominant
stage shows regardless)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from moonshine_tpu.accel import packet
from moonshine_tpu.bsdf import materials as B
from moonshine_tpu.core import rng as R
from moonshine_tpu.core.frame import Frame
from moonshine_tpu.integrator import path as P
from moonshine_tpu.lights.envmap import (
    envmap_incoming_radiance, miss_radiance_and_pdf, sample_envmap,
)
from moonshine_tpu.lights.mesh_lights import sample_mesh_lights
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    scene, lens = _flagship_scene()
    la = LensArrays.from_lens(lens)
    H = W = 512
    N = H * W
    print(f"tris={scene.num_tris} env_size={scene.env.size} "
          f"rgbl_rows={scene.env.rgbl.shape}", flush=True)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap = R.next_float2(rng)
    o, d = generate_rays(la, W, H, uv, ap)
    o, d = jax.block_until_ready((o, d))

    hit = jax.block_until_ready(packet.closest_hit_packet(scene.wide, o, d, 1e30))
    tri = jnp.clip(hit.tri, 0, scene.num_tris - 1)
    active = hit.tri >= 0

    dec = jax.jit(lambda t, u, v: P._decode_hit(scene, t, u, v))
    out = jax.block_until_ready(dec(tri, hit.u, hit.v))
    position, uvc, tri_frame, vtx_frame, mat_row, _ = out

    decm = jax.jit(lambda m, u: P._decode_material(scene, m, u))
    mat, emissive, normal_rg = jax.block_until_ready(decm(mat_row, uvc))
    frame = tri_frame
    w_o_ss = jax.block_until_ready(frame.world_to_frame(-d))

    timeit("closest_hit packet (VMEM)", lambda: packet.closest_hit_packet(
        scene.wide, o, d, 1e30))
    timeit("decode_hit (2 gathers + frames)", lambda: dec(tri, hit.u, hit.v))
    timeit("decode_material", lambda: decm(mat_row, uvc))

    rng2, r2 = R.next_float2(rng)
    se = jax.jit(lambda r: sample_envmap(scene.env, r))
    timeit("sample_envmap", lambda: se(r2))
    mr = jax.jit(lambda dd: miss_radiance_and_pdf(scene.env, dd))
    timeit("miss_radiance_and_pdf", lambda: mr(d))
    ei = jax.jit(lambda dd: envmap_incoming_radiance(scene.env, dd))
    timeit("envmap_incoming_radiance", lambda: ei(d))
    sm = jax.jit(lambda p, r: sample_mesh_lights(scene, p, r))
    out_sm = jax.block_until_ready(sm(position, r2))
    timeit("sample_mesh_lights", lambda: sm(position, r2))
    em = jax.jit(lambda row, b: P._emissive_at(scene, row, b))
    timeit("emissive_at (NEE light eval)", lambda: em(out_sm[6],
                                                      jnp.stack([hit.u, hit.v], -1)))

    sb = jax.jit(lambda w, r: B.sample_bsdf(mat, w, r))
    timeit("sample_bsdf", lambda: sb(w_o_ss, r2))
    eb = jax.jit(lambda wi, wo: B.eval_bsdf(mat, wi, wo))
    timeit("eval_bsdf", lambda: eb(w_o_ss, w_o_ss))
    pb = jax.jit(lambda wi, wo: B.pdf_bsdf(mat, wi, wo))
    timeit("pdf_bsdf", lambda: pb(w_o_ss, w_o_ss))

    rn = jax.jit(lambda r: R.next_float2(r))
    timeit("rng next_float2", lambda: rn(rng))

    st = dict(
        active=active, o=o, d=d,
        throughput=jnp.ones((N, 3), jnp.float32),
        radiance=jnp.zeros((N, 3), jnp.float32),
        last_pdf=jnp.ones(N, jnp.float32),
        last_delta=jnp.zeros(N, bool),
        rng=rng, rays=jnp.asarray(0.0, jnp.float32),
        pix=jnp.arange(N, dtype=jnp.int32),
    )
    cfg = P.PathConfig(max_bounces=4)
    bb = jax.jit(lambda s: P._bounce_body(scene, cfg, 1, s))
    timeit("_bounce_body full (1 seg)", lambda: bb(st), n=3)


if __name__ == "__main__":
    main()
