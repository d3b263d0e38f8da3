"""Ablation profiling of the fused flagship render: knock out one
subsystem at a time inside the REAL fused render_sample graph and measure
the marginal cost. Isolated per-stage timings mislead (fusion + a ~23 ms
dispatch floor over the device tunnel); the marginal deltas here are what
optimization actually recovers.

Each ablation monkeypatches module-level names before tracing and calls
jax.clear_caches() so cached traces can't mask the patch.
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
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render import renderer as RR


def timeit(fn, n=4):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    scene, lens = _flagship_scene()
    la = LensArrays.from_lens(lens)
    H = W = 512
    cfg = P.PathConfig(max_bounces=4)

    def full():
        return RR.render_sample(scene, la, H, W, jnp.asarray(1, jnp.uint32),
                                cfg)[0]

    orig_closest = P._closest
    orig_anyhit = P._any_hit
    orig_gather = P.gather_rows
    orig_decode_mat = P._decode_material

    def run(name):
        jax.clear_caches()
        dt = timeit(full)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    base = run("full render_sample")

    # --- no traversal: fixed hits, no shadow occlusion
    T = scene.num_tris

    def fake_closest(scene_, o, d, t_max, active, presorted=False):
        n = o.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        return Hit(t=jnp.full((n,), 2.0, jnp.float32),
                   tri=lane % T,
                   u=jnp.full((n,), 0.3, jnp.float32),
                   v=jnp.full((n,), 0.3, jnp.float32))

    def fake_anyhit(scene_, o, d, t_max, active, presorted=False):
        return jnp.zeros((o.shape[0],), bool)

    P._closest = fake_closest
    P._any_hit = fake_anyhit
    no_trav = run("  - traversal (fixed hits)")
    P._closest = orig_closest
    P._any_hit = orig_anyhit

    # --- no closest only
    P._closest = fake_closest
    no_closest = run("  - closest only")
    P._closest = orig_closest

    # --- no anyhit only
    P._any_hit = fake_anyhit
    no_any = run("  - anyhit only")
    P._any_hit = orig_anyhit

    # --- no row gathers (decode_hit + emissive_at + mesh light rows read row 0)
    def fake_gather(table, ids):
        return jnp.broadcast_to(table[0], (ids.shape[0],) + table.shape[1:])

    P.gather_rows = fake_gather
    import moonshine_tpu.lights.mesh_lights as ML
    orig_ml_gather = ML.gather_rows
    ML.gather_rows = fake_gather
    no_gather = run("  - row gathers (row-0 broadcast)")
    P.gather_rows = orig_gather
    ML.gather_rows = orig_ml_gather

    # --- no decode_material (constants)
    def fake_decode_mat(scene_, mat_row, uv):
        import moonshine_tpu.bsdf.materials as B
        n = mat_row.shape[0]
        lanes = B.MaterialLanes(
            type=jnp.zeros((n,), jnp.int32),
            color=jnp.full((n, 3), 0.5),
            metalness=jnp.zeros((n,)),
            alpha=jnp.full((n,), 0.25),
            ior=jnp.full((n,), 1.5),
        )
        return lanes, jnp.zeros((n, 3)), jnp.full((n, 2), 0.5)

    P._decode_material = fake_decode_mat
    no_mat = run("  - decode_material (constants)")
    P._decode_material = orig_decode_mat

    # --- no NEE at all (config)
    jax.clear_caches()
    cfg0 = P.PathConfig(max_bounces=4, env_samples_per_bounce=0,
                        mesh_samples_per_bounce=0)
    dt = timeit(lambda: RR.render_sample(
        scene, la, H, W, jnp.asarray(1, jnp.uint32), cfg0)[0])
    print(f"{'  - NEE (0 samples config)':44s} {dt*1e3:9.2f} ms", flush=True)

    print()
    print(f"marginal closest   : {(base - no_closest)*1e3:7.2f} ms")
    print(f"marginal anyhit    : {(base - no_any)*1e3:7.2f} ms")
    print(f"marginal traversal : {(base - no_trav)*1e3:7.2f} ms")
    print(f"marginal gathers   : {(base - no_gather)*1e3:7.2f} ms")
    print(f"marginal material  : {(base - no_mat)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
