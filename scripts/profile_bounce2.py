"""True in-graph per-stage costs of one flagship bounce.

The device tunnel adds ~25 ms of per-dispatch argument overhead, so every
stage here runs K times inside ONE jitted lax.fori_loop with a data
dependence threaded through (perturbing an input from the prior output so
nothing CSEs or folds), and the cost is (loop - empty) / K.
"""

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
from moonshine_tpu.integrator import path as P
from moonshine_tpu.lights.envmap import miss_radiance_and_pdf, sample_envmap
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
    pos, uvc, tri_frame, vtx_frame, mat_row, _ = jax.jit(
        lambda t, u, v: P._decode_hit(scene, t, u, v))(tri, hit.u, hit.v)
    mat, emissive, normal_rg = jax.jit(
        lambda m, u: P._decode_material(scene, m, u))(mat_row, uvc)
    w_o_ss = tri_frame.world_to_frame(-d)
    r2 = jax.block_until_ready(R.next_float2(rng)[1])

    def loop(stage, seed_vec):
        """stage: f(vec [N,3] perturbation) -> scalar-ish contribution."""

        @jax.jit
        def run(v0):
            def body(i, carry):
                v, acc = carry
                out = stage(v)
                nv = v + out[0] * 1e-20
                return nv, acc + out[0]

            _, acc = jax.lax.fori_loop(0, K, body,
                                       (v0, jnp.float32(0)))
            return acc

        return lambda: run(seed_vec)

    @jax.jit
    def empty(v0):
        def body(i, carry):
            v, acc = carry
            return v * 1.0000001, acc + v[0]

        _, acc = jax.lax.fori_loop(0, K, body, (v0, jnp.float32(0)))
        return acc

    floor = timeit(lambda: empty(jnp.ones((8,), jnp.float32)))

    def report(name, dt):
        print(f"{name:44s} {(dt - floor)/K*1e3:8.3f} ms", flush=True)

    eps = jnp.zeros((N, 3), jnp.float32)

    # traversal kernels (perturb directions)
    report("closest_hit packet (262k)", timeit(loop(
        lambda v: packet.closest_hit_packet(
            scene.wide, o, d + v * 1e-30, 1e30).t[:8],
        eps)))
    o2 = jnp.concatenate([o, o])
    d2 = jnp.concatenate([d, -d])
    report("any_hit packet (524k)", timeit(loop(
        lambda v: packet.any_hit_packet(
            scene.wide, o2, d2 + jnp.concatenate([v, v]) * 1e-30, 1e30
        ).astype(jnp.float32)[:8],
        eps)))

    report("decode_hit (gather+interp+frames)", timeit(loop(
        lambda v: P._decode_hit(scene, tri, hit.u + v[:, 0] * 1e-30,
                                hit.v)[0][:8, 0], eps)))
    report("decode_material (atlas bilinear)", timeit(loop(
        lambda v: P._decode_material(
            scene, mat_row, uvc + v[:, :2] * 1e-30)[0].color[:8, 0], eps)))
    report("sample_envmap", timeit(loop(
        lambda v: sample_envmap(scene.env, r2 + v[:, :2] * 1e-30)[2][:8], eps)))
    report("miss_radiance_and_pdf", timeit(loop(
        lambda v: miss_radiance_and_pdf(scene.env, d + v * 1e-30)[2][:8], eps)))
    report("sample_mesh_lights", timeit(loop(
        lambda v: sample_mesh_lights(scene, pos + v * 1e-30, r2)[5][:8], eps)))
    report("sample_bsdf", timeit(loop(
        lambda v: B.sample_bsdf(mat, w_o_ss + v * 1e-30, r2)[1][:8], eps)))
    report("eval_bsdf", timeit(loop(
        lambda v: B.eval_bsdf(mat, w_o_ss + v * 1e-30, w_o_ss)[:8, 0], eps)))
    report("pdf_bsdf", timeit(loop(
        lambda v: B.pdf_bsdf(mat, w_o_ss + v * 1e-30, w_o_ss)[:8], eps)))
    report("rng next_float2 + seed math", timeit(loop(
        lambda v: R.next_float2(rng)[1][:8, 0] + v[:8, 0] * 1e-30, eps)))

    # one full bounce segment
    st = dict(
        active=hit.tri >= 0, o=o, d=d,
        throughput=jnp.ones((N, 3), jnp.float32),
        radiance=jnp.zeros((N, 3), jnp.float32),
        last_pdf=jnp.ones(N, jnp.float32),
        last_delta=jnp.zeros(N, bool),
        rng=rng, rays=jnp.asarray(0.0, jnp.float32),
        pix=jnp.arange(N, dtype=jnp.int32),
    )
    cfg = P.PathConfig(max_bounces=4)

    @jax.jit
    def bounce_loop(o0):
        def body(i, carry):
            s = carry
            s = dict(s, o=s["o"] + s["radiance"] * 1e-20)
            s2 = P._bounce_body(scene, cfg, 1, s)
            return dict(s2, active=st["active"], o=st["o"], d=st["d"])

        out = jax.lax.fori_loop(0, K, body, dict(st, o=o0))
        return out["radiance"][0]

    dt = timeit(lambda: bounce_loop(o))
    report("FULL _bounce_body segment", dt)


if __name__ == "__main__":
    main()
