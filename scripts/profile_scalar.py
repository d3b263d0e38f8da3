"""Round-5 order #1 prerequisite: decompose the per-visit scalar
instruction stream of the packet traversal kernels.

Method: inject k synthetic ops per visit (SMEM scalar reads, predicated
stack stores, full-width vector ops — packet._PROBE_*) into the production
kernel, fit the marginal cost of each op class from the timing slope, and
multiply by the real kernel's per-visit op counts. Also measures the
serial-DMA variant (no next-pop prefetch) to bound DMA-latency exposure.

Run on the room_184k rung (HBM kernel, production w/cap tier), bounce-1
rays, isolated K-looped dispatches (profile_room.py methodology).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.accel import packet
from moonshine_tpu.core import rng as R
from moonshine_tpu.core.sortutil import sort_lanes
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
from moonshine_tpu.scene.procedural import room_scene

K = 8
INF = 1e30


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def bounce1_rays(scene, lens):
    la = LensArrays.from_lens(lens)
    H = W = 512
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap = R.next_float2(rng)
    o, d = generate_rays(la, W, H, uv, ap)
    st0 = jax.jit(P._init_state)(o, d, rng)
    cfg = P.PathConfig(max_bounces=4)
    st1 = jax.block_until_ready(jax.jit(
        lambda s: P._bounce_body(scene, cfg, jnp.asarray(0, jnp.int32), s)
    )(dict(st0)))
    return st1["o"], st1["d"], st1["active"]


def sorted_rays(wtree, o, d, active):
    key = packet._sort_key(wtree, o, d, active)
    N = o.shape[0]
    t_eff = jnp.where(active, jnp.full((N,), INF, jnp.float32), packet._NEG)
    _, (o_s, d_s, t_s) = sort_lanes(key, [o, d, t_eff])
    return jax.block_until_ready((o_s, d_s, t_s))


def make_runs(wtree, o_s, d_s, t_s):
    """Fresh jits each call so the current packet._PROBE_* knobs bake in."""
    @jax.jit
    def run_c(o1, d1):
        def body(i, carry):
            oo, dd = carry
            hit = packet._closest_impl(wtree, oo, dd, t_s, None, False, True)
            return oo, dd + hit.t[:, None] * 1e-9
        return jax.lax.fori_loop(0, K, body, (o1, d1))

    @jax.jit
    def run_a(o1, d1):
        def body(i, carry):
            oo, dd = carry
            occ = packet._anyhit_impl(wtree, oo, dd, t_s, None, False, True)
            return oo, dd + occ[:, None].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, K, body, (o1, d1))

    return run_c, run_a


def visit_counts(wtree, o_s, d_s, t_s):
    hit, cnt = jax.jit(lambda o, d: packet._closest_impl(
        wtree, o, d, t_s, None, False, True, count_visits=True))(o_s, d_s)
    total = float(jnp.sum(cnt[:, 0, 0]))
    internal = float(jnp.sum(cnt[:, 1, 0]))
    _, cnt_a = jax.jit(lambda o, d: packet._anyhit_impl(
        wtree, o, d, t_s, None, False, True, count_visits=True))(o_s, d_s)
    total_a = float(jnp.sum(cnt_a[:, 0, 0]))
    internal_a = float(jnp.sum(cnt_a[:, 1, 0]))
    return (total, internal), (total_a, internal_a)


def main():
    world, lens = room_scene(grid=6, subdivisions=4)
    scene = world.build()
    wtree = scene.wide
    w, cap = wtree.width, wtree.leaf_slots
    print(f"room_184k  width={w} leaf_slots={cap} "
          f"nodes={wtree.num_nodes} leaves={wtree.num_leaves}", flush=True)

    o, d, active = bounce1_rays(scene, lens)
    o_s, d_s, t_s = sorted_rays(wtree, o, d, active)

    (vis_c, int_c), (vis_a, int_a) = visit_counts(wtree, o_s, d_s, t_s)
    leaf_c, leaf_a = vis_c - int_c, vis_a - int_a
    print(f"closest visits {vis_c:.0f} (internal {int_c:.0f} leaf {leaf_c:.0f})")
    print(f"anyhit  visits {vis_a:.0f} (internal {int_a:.0f} leaf {leaf_a:.0f})",
          flush=True)

    results = {}

    def measure(tag):
        run_c, run_a = make_runs(wtree, o_s, d_s, t_s)
        tc = timeit(lambda: run_c(o_s, d_s)) / K
        ta = timeit(lambda: run_a(o_s, d_s)) / K
        results[tag] = (tc, ta)
        print(f"{tag:<24} closest {tc*1e3:7.2f} ms  anyhit {ta*1e3:7.2f} ms",
              flush=True)
        return tc, ta

    measure("baseline")

    sweeps = [
        ("reads", "_PROBE_EXTRA_READS", [64, 128]),
        ("push", "_PROBE_EXTRA_PUSH", [8, 16]),
        ("vec", "_PROBE_EXTRA_VEC", [32, 64]),
    ]
    slopes = {}
    for name, attr, ks in sweeps:
        pts_c, pts_a = [(0, results["baseline"][0])], [(0, results["baseline"][1])]
        for k in ks:
            setattr(packet, attr, k)
            tc, ta = measure(f"{name}+{k}")
            pts_c.append((k, tc))
            pts_a.append((k, ta))
        setattr(packet, attr, 0)
        fit = lambda pts: np.polyfit([p[0] for p in pts],
                                     [p[1] for p in pts], 1)[0]
        slopes[name] = (fit(pts_c), fit(pts_a))

    packet._PROBE_NO_PREFETCH = True
    measure("no_prefetch")
    packet._PROBE_NO_PREFETCH = False

    # --- decomposition ---
    tc0, ta0 = results["baseline"]
    reads_int = 7 * w + 1
    reads_leaf = 10 * cap
    push_ops = w  # predicated store + carry add per child slot
    print("\n--- marginal costs (ns per synthetic op per visit) ---")
    for name, (sc, sa) in slopes.items():
        # slope is s/op over the whole dispatch; per-visit cost = slope/visits
        print(f"{name:<6} closest {sc/vis_c*1e9:7.2f}  anyhit {sa/vis_a*1e9:7.2f}")

    for tag, t0, vis, n_int, n_leaf in [
        ("closest", tc0, vis_c, int_c, leaf_c),
        ("anyhit", ta0, vis_a, int_a, leaf_a),
    ]:
        i = 0 if tag == "closest" else 1
        read_cost = slopes["reads"][i] / vis
        push_cost = slopes["push"][i] / vis
        decode = read_cost * (reads_int * n_int + reads_leaf * n_leaf) / vis
        push = push_cost * push_ops * n_int / vis
        per_visit = t0 / vis
        print(f"\n{tag}: per-visit {per_visit*1e9:.0f} ns | "
              f"decode {decode*1e9:.0f} ns ({decode/per_visit:.0%}) | "
              f"push {push*1e9:.0f} ns ({push/per_visit:.0%}) | "
              f"residual {(per_visit-decode-push)*1e9:.0f} ns")


if __name__ == "__main__":
    main()
