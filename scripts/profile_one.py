"""Single-variant, fresh-process traversal measurement (round-5 measurement
hygiene): in-process A/B sweeps on the tunneled chip were found to corrupt
after a handful of compiled variants (later dispatches read ~= the empty-loop
floor — impossible), so each (scene, state, kernel) cell runs alone here and
a sweep is a shell loop. Prints one JSON line.

Usage: profile_one.py --scene room_184k|room_1m --state primary|bounce1
                      --kernel row|v --kind closest|anyhit [--k 10]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="room_184k")
    ap.add_argument("--state", default="bounce1")
    ap.add_argument("--kernel", default="row")
    ap.add_argument("--kind", default="closest")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tmax", type=float, default=1e30)
    # scalar-stream decomposition probes (packet._PROBE_*, row kernel only)
    ap.add_argument("--probe-reads", type=int, default=0)
    ap.add_argument("--probe-push", type=int, default=0)
    ap.add_argument("--probe-vec", type=int, default=0)
    ap.add_argument("--probe-s2v", type=int, default=0)
    ap.add_argument("--no-prefetch", action="store_true")
    ap.add_argument("--count-visits", action="store_true")
    ap.add_argument("--hbm-block", type=int, default=None,
                    help="override packet.HBM_BLOCK for this cell")
    ap.add_argument("--exit-every", type=int, default=None,
                    help="anyhit exit-check interval (power of 2)")
    ap.add_argument("--leaf-slots", type=int, default=None,
                    help="intersect only the first N leaf slots per visit")
    args = ap.parse_args()
    K = args.k

    from moonshine_tpu.accel import packet, vpacket

    if args.hbm_block:
        packet.set_block_size(packet.BLOCK, args.hbm_block)
    if args.exit_every is not None:
        packet._PROBE_EXIT_EVERY = args.exit_every
    if args.leaf_slots is not None:
        packet._LEAF_SLOTS_OVERRIDE = args.leaf_slots

    packet._PROBE_EXTRA_READS = args.probe_reads
    packet._PROBE_EXTRA_PUSH = args.probe_push
    packet._PROBE_EXTRA_VEC = args.probe_vec
    packet._PROBE_EXTRA_S2V = args.probe_s2v
    packet._PROBE_NO_PREFETCH = args.no_prefetch
    from moonshine_tpu.core import rng as R
    from moonshine_tpu.integrator import path as P
    from moonshine_tpu.render.camera import LensArrays, generate_rays, pixel_uv
    from moonshine_tpu.scene.procedural import room_scene

    grid, sub = (7, 5) if args.scene == "room_1m" else (6, 4)
    world, lens = room_scene(grid=grid, subdivisions=sub)
    scene = world.build()
    w = scene.wide

    la = LensArrays.from_lens(lens)
    H = W = 512
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.uint32),
                          jnp.arange(W, dtype=jnp.uint32), indexing="ij")
    px, py = xs.reshape(-1), ys.reshape(-1)
    rng = R.seed(jnp.asarray(0, jnp.uint32), px, py)
    rng, jitter = R.next_float2(rng)
    uv = pixel_uv(px, py, W, H, jitter, True)
    rng, ap_ = R.next_float2(rng)
    o, d = generate_rays(la, W, H, uv, ap_)
    st = jax.block_until_ready(jax.jit(P._init_state)(o, d, rng))
    if args.state == "bounce1":
        cfg = P.PathConfig(max_bounces=4)
        st = jax.block_until_ready(jax.jit(
            lambda s: P._bounce_body(scene, cfg, jnp.asarray(0, jnp.int32), s)
        )(dict(st)))

    if args.kernel == "v":
        v = vpacket.v_from_wide(w)
        fns = {
            "closest": lambda oo, dd, act: vpacket.closest_hit_vpacket_hbm(
                v, oo, dd, args.tmax, active_in=act),
            "anyhit": lambda oo, dd, act: vpacket.any_hit_vpacket_hbm(
                v, oo, dd, args.tmax, active_in=act),
        }
    else:
        fns = {
            "closest": lambda oo, dd, act: packet.closest_hit_packet_hbm(
                w, oo, dd, args.tmax, active_in=act),
            "anyhit": lambda oo, dd, act: packet.any_hit_packet_hbm(
                w, oo, dd, args.tmax, active_in=act),
        }
    fn = fns[args.kind]

    @jax.jit
    def run(s):
        def body(i, carry):
            oo, acc = carry
            out = fn(oo, s["d"], s["active"])
            vv = jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)
            ssum = jnp.sum(vv)
            # data-dependence between iterations WITHOUT moving the rays:
            # tanh bounds the feedback to +-1e-6 regardless of the output
            # scale. (The earlier ssum*1e-7 form teleported closest-hit
            # origins to ~1e28 after iteration 1 — miss lanes carry
            # t=1e30, so 9 of the K iterations traced empty frames and
            # every closest/row-vs-V/probe-slope number was diluted ~K x.
            # Anyhit sums bounded occlusion counts, so its cells were
            # real — the round-5 "anyhit is 5x slower" reading was this
            # bug, not the kernel.)
            return oo + jnp.tanh(ssum) * 1e-6, acc + ssum

        _, acc = jax.lax.fori_loop(0, K, body, (s["o"], jnp.float32(0)))
        return acc

    @jax.jit
    def empty(s):
        def body(i, c):
            return c * 1.0000001
        return jax.lax.fori_loop(0, K, body, s["d"])

    def timeit(f, n=3):
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(f())
        return (time.perf_counter() - t0) / n

    floor = timeit(lambda: empty(st))
    dt = (timeit(lambda: run(st)) - floor) / K
    out = {
        "scene": args.scene, "state": args.state, "kernel": args.kernel,
        "kind": args.kind, "ms": round(dt * 1e3, 3),
        "floor_ms": round(floor * 1e3, 3),
        "live": int(jnp.sum(st["active"])),
        "width": w.width, "leaf_slots": w.leaf_slots,
        "hbm_block": packet.HBM_BLOCK,
        "probe": [args.probe_reads, args.probe_push, args.probe_vec,
                  args.probe_s2v, int(args.no_prefetch)],
    }
    if args.count_visits and args.kernel == "row":
        t_eff = jnp.where(st["active"], jnp.float32(args.tmax),
                          packet._NEG)
        from moonshine_tpu.core.sortutil import sort_lanes
        key = packet._sort_key(w, st["o"], st["d"], st["active"])
        _, (o_s, d_s, t_s) = sort_lanes(key, [st["o"], st["d"], t_eff])
        impl = (packet._closest_impl if args.kind == "closest"
                else packet._anyhit_impl)
        res = jax.jit(lambda o2, d2: impl(
            w, o2, d2, t_s, None, False, True, count_visits=True
        ))(o_s, d_s)
        cnt = res[1]
        total = float(jnp.sum(cnt[:, 0, 0]))
        internal = float(jnp.sum(cnt[:, 1, 0]))
        out["visits"] = total
        out["visits_internal"] = internal
    print(json.dumps(out))


if __name__ == "__main__":
    main()
