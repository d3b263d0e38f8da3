"""Round-5 order #1 prerequisite: decompose the per-visit scalar
instruction stream of the packet traversal kernels.

Method: inject k synthetic ops per visit (SMEM scalar reads, predicated
stack stores, full-width vector ops — packet._PROBE_*) into the production
kernel, fit the marginal cost of each op class from the timing slope, and
multiply by the real kernel's per-visit op counts. Also measures the
serial-DMA variant (no next-pop prefetch) to bound DMA-latency exposure.

Measurement hygiene: every timing cell runs in its OWN process
(profile_one.py) — in-process sweeps on the tunneled chip corrupt after a
handful of compiled variants (later dispatches under-read toward the
empty-loop floor). This orchestrator shells out per cell and fits the
slopes from the collected JSON. Visit counts are values, not timings, so
one process computes both.

Run on the room_184k rung (HBM kernel, production w/cap tier), bounce-1
rays, sorted dispatch (profile_room.py methodology).
"""

import argparse
import json
import pathlib
import subprocess
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parent


def run_cell(kind, extra, timeout=1800):
    cmd = [sys.executable, str(HERE / "profile_one.py"),
           "--scene", "room_184k", "--state", "bounce1",
           "--kernel", "row", "--kind", kind] + extra
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=str(ROOT), timeout=timeout)
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")), None)
    if line is None:
        print(f"CELL FAILED {kind} {extra}:\n{proc.stderr[-1500:]}",
              flush=True)
        return None
    out = json.loads(line)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kinds", default="closest,anyhit")
    args = ap.parse_args()
    kinds = args.kinds.split(",")

    # one cell records visit counts (values — immune to timing corruption)
    vis = {}
    for kind in kinds:
        cell = run_cell(kind, ["--count-visits", "--k", "2"])
        if cell and "visits" in cell:
            vis[kind] = (cell["visits"], cell["visits_internal"])

    sweeps = [
        ("reads", "--probe-reads", [64, 128]),
        ("push", "--probe-push", [8, 16]),
        ("vec", "--probe-vec", [32, 64]),
        ("s2v", "--probe-s2v", [48, 96]),
    ]

    for kind in kinds:
        base = run_cell(kind, [])
        if base is None:
            continue
        t0 = base["ms"] / 1e3
        slopes = {}
        for name, flag, ks in sweeps:
            pts = [(0, t0)]
            for k in ks:
                cell = run_cell(kind, [flag, str(k)])
                if cell:
                    pts.append((k, cell["ms"] / 1e3))
            if len(pts) >= 2:
                slopes[name] = np.polyfit([p[0] for p in pts],
                                          [p[1] for p in pts], 1)[0]
        nopf = run_cell(kind, ["--no-prefetch"])

        if kind not in vis or not slopes:
            continue
        total, internal = vis[kind]
        leaf = total - internal
        # production per-visit op counts from the measured tier
        w = base.get("width", 24)
        cap = base.get("leaf_slots", 24)
        reads_int = 7 * w + 1
        reads_leaf = 10 * cap
        push_ops = w

        per_visit = t0 / total
        read_cost = slopes.get("reads", 0.0) / total
        push_cost = slopes.get("push", 0.0) / total
        vec_cost = slopes.get("vec", 0.0) / total
        s2v_cost = slopes.get("s2v", 0.0) / total
        decode = read_cost * (reads_int * internal + reads_leaf * leaf) / total
        push = push_cost * push_ops * internal / total
        print(f"\n=== {kind}: visits {total:.0f} (internal {internal:.0f}"
              f" leaf {leaf:.0f}) ===")
        print(f"marginal ns/op: read {read_cost*1e9:.2f} "
              f"push {push_cost*1e9:.2f} vec {vec_cost*1e9:.2f} "
              f"s2v-chain {s2v_cost*1e9:.2f} (broadcast share "
              f"{(s2v_cost-read_cost-vec_cost)*1e9:.2f})")
        print(f"per-visit {per_visit*1e9:.0f} ns | "
              f"decode(scalar reads) {decode*1e9:.0f} ns "
              f"({decode/per_visit:.0%}) | push {push*1e9:.0f} ns "
              f"({push/per_visit:.0%}) | residual "
              f"{(per_visit-decode-push)*1e9:.0f} ns")
        if nopf:
            print(f"no-prefetch: {nopf['ms']:.2f} ms vs baseline "
                  f"{base['ms']:.2f} ms -> DMA-latency exposure "
                  f"{(nopf['ms']-base['ms'])/total*1e6:.0f} ns/visit")


if __name__ == "__main__":
    main()
