"""Resort-key variants, end-to-end on the VMEM flagship.

profile_resort.py showed the per-bounce state resort is now a win on VMEM
scenes (+11%). This A/Bs the key arrangement: cell-major vs octant-major
vs coarser cells.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_scene
from moonshine_tpu.core.sortutil import sort_lanes
from moonshine_tpu.integrator import path as P
from moonshine_tpu.render.camera import LensArrays
from moonshine_tpu.render.renderer import render_spp


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def make_resort(key_fn):
    def _resort_state(scene, st):
        wide = getattr(scene, "wide", None)
        if wide is None:
            return st
        o, d, active = st["o"], st["d"], st["active"]
        lo = wide.bounds[0]
        inv_ext = 1.0 / jnp.maximum(wide.bounds[1] - lo, 1e-20)
        key = key_fn(o, d, lo, inv_ext)
        key = jnp.where(active, key, jnp.int32(1 << 20))
        names = [k for k, v in st.items() if jnp.ndim(v) > 0]
        _, sorted_arrays = sort_lanes(key, [st[k] for k in names])
        out = dict(st)
        out.update(zip(names, sorted_arrays))
        return out

    return _resort_state


def octant_of(d):
    return ((d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32))


def cell_of(o, lo, inv_ext, n):
    return jnp.clip(((o - lo) * inv_ext * n).astype(jnp.int32), 0, n - 1)


def k_cell8_oct(o, d, lo, inv_ext):  # current
    c = cell_of(o, lo, inv_ext, 8)
    return ((c[:, 0] * 8 + c[:, 1]) * 8 + c[:, 2]) * 8 + octant_of(d)


def k_oct_cell8(o, d, lo, inv_ext):
    c = cell_of(o, lo, inv_ext, 8)
    return octant_of(d) * 512 + (c[:, 0] * 8 + c[:, 1]) * 8 + c[:, 2]


def k_cell4_oct(o, d, lo, inv_ext):
    c = cell_of(o, lo, inv_ext, 4)
    return ((c[:, 0] * 4 + c[:, 1]) * 4 + c[:, 2]) * 8 + octant_of(d)


def k_cell16_oct(o, d, lo, inv_ext):
    c = cell_of(o, lo, inv_ext, 16)
    return ((c[:, 0] * 16 + c[:, 1]) * 16 + c[:, 2]) * 8 + octant_of(d)


def main():
    scene, lens = _flagship_scene()
    la = LensArrays.from_lens(lens)
    H = W = 512
    cfg = P.PathConfig(max_bounces=4, resort_bounces=True)

    orig = P._resort_state
    for name, key_fn in [
        ("cell8-major, octant-minor (current)", k_cell8_oct),
        ("octant-major, cell8-minor", k_oct_cell8),
        ("cell4-major, octant-minor", k_cell4_oct),
        ("cell16-major, octant-minor", k_cell16_oct),
    ]:
        P._resort_state = make_resort(key_fn)
        jax.clear_caches()
        try:
            SPP = 4
            img, rays = render_spp(scene, la, H, W, 0, SPP, cfg)
            img.block_until_ready()
            dt = timeit(lambda: render_spp(
                scene, la, H, W, SPP, SPP, cfg)[0], n=3) / SPP
            print(f"{name:40s} {dt*1e3:7.2f} ms/sample  "
                  f"mean={float(jnp.mean(img))/SPP:.6f}", flush=True)
        finally:
            P._resort_state = orig


if __name__ == "__main__":
    main()
