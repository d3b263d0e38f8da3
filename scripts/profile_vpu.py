"""VPU microbenchmarks for traversal-kernel arithmetic choices.

Answers, with wall-clock on the attached TPU:
  1. Is bf16 elementwise math faster than f32 on the VPU (the slab-test op
     mix: mul/sub/min/max/compare on scalar-broadcast operands)?
  2. Does writing the slab test as lo*inv - o_inv (FMA-shaped) beat
     (lo - o)*inv (sub-then-mul)?
  3. What does the per-child `jnp.any` reduction cost vs a single packed
     bitwise-or reduction for all 8 children?

Each kernel runs V simulated internal visits over one 8192-lane block and
is timed over the whole dispatch; per-visit numbers are the quotient.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64
VISITS = 2000
W = 8


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n
    per_visit = dt / VISITS * 1e6
    print(f"{name:44s} {dt*1e3:8.2f} ms  ({per_visit:6.2f} us/visit)",
          flush=True)
    return dt


def _mk_slab(dtype, fma_form: bool, packed_any: bool):
    def kernel(rows_ref, ox, oy, oz, ix, iy, iz, out_ref):
        o = (ox[0], oy[0], oz[0])
        inv = (ix[0], iy[0], iz[0])
        oinv = tuple(o[c] * inv[c] for c in range(3))
        prune = jnp.full_like(o[0], jnp.finfo(dtype).max)

        def body(v, acc):
            def nrow(col):
                return rows_ref[v % 128, col].astype(dtype)

            hits = []
            for j in range(W):
                lo = [nrow(c * 8 + j) for c in range(3)]
                hi = [nrow(24 + c * 8 + j) for c in range(3)]
                if fma_form:
                    t0 = [lo[c] * inv[c] - oinv[c] for c in range(3)]
                    t1 = [hi[c] * inv[c] - oinv[c] for c in range(3)]
                else:
                    t0 = [(lo[c] - o[c]) * inv[c] for c in range(3)]
                    t1 = [(hi[c] - o[c]) * inv[c] for c in range(3)]
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0[0], t1[0]),
                                jnp.minimum(t0[1], t1[1])),
                    jnp.minimum(t0[2], t1[2]))
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0[0], t1[0]),
                                jnp.maximum(t0[1], t1[1])),
                    jnp.maximum(t0[2], t1[2]))
                if dtype == jnp.bfloat16:
                    # bf16 compares produce (16,128)-tiled i1 vectors that
                    # Mosaic can't relayout; compare in f32 instead (the
                    # min/max/mul ALU stays bf16 — that's what's measured)
                    tnear = tnear.astype(jnp.float32)
                    tfar = tfar.astype(jnp.float32)
                    hit = ((tnear <= tfar) & (tfar >= 0.0)
                           & (tnear <= prune.astype(jnp.float32)))
                else:
                    hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= prune)
                hits.append(hit)
            if packed_any:
                packed = hits[0].astype(jnp.int32)
                for j in range(1, W):
                    packed = packed | (hits[j].astype(jnp.int32) << j)
                bits = jnp.max(packed)  # one reduction (or-like: max of bits)
                return acc + bits
            s = jnp.int32(0)
            for j in range(W):
                s = s + jnp.any(hits[j]).astype(jnp.int32)
            return acc + s

        acc = jax.lax.fori_loop(0, VISITS, body, jnp.int32(0))
        out_ref[0, 0] = acc

    def run():
        rows = jnp.ones((128, 128), jnp.float32) * 0.5
        lane = jnp.ones((1, ROWS, 128), dtype)
        args = [rows] + [lane * (0.1 * (i + 1)) for i in range(6)]
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((1, ROWS, 128), lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(*args)

    return run


def _mk_alu(dtype, rows=64):
    """Pure vector-ALU loop: V iterations of a mul/min/max/add chain on a
    (rows,128) block with a carried dependence — no SMEM reads, no
    compares. Answers whether bf16 elementwise math outruns f32 on the
    VPU at all."""

    def kernel(a_ref, b_ref, out_ref):
        a0 = a_ref[0]
        b = b_ref[0]

        def body(v, a):
            a = a * b + a
            a = jnp.minimum(a * 1.0000001, a + b)
            a = jnp.maximum(a - b, a * 0.9999999)
            a = a * b + b
            a = jnp.minimum(a, b * 1.5)
            a = jnp.maximum(a, b * 0.5)
            return a

        out_ref[0] = jax.lax.fori_loop(0, VISITS, body, a0)

    def run():
        a = jnp.full((1, rows, 128), 1.0, dtype)
        b = jnp.full((1, rows, 128), 0.5, dtype)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((1, rows, 128), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1, rows, 128), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, rows, 128), dtype),
        )(a, b)

    return run


def main():
    print(f"device: {jax.devices()[0]}")
    for name, fn in [
        ("pure ALU f32 (64x128, 10 ops/iter)", _mk_alu(jnp.float32)),
        ("pure ALU bf16 (64x128, 10 ops/iter)", _mk_alu(jnp.bfloat16)),
        ("pure ALU f32 (256x128)", _mk_alu(jnp.float32, rows=256)),
        ("pure ALU bf16 (256x128)", _mk_alu(jnp.bfloat16, rows=256)),
    ]:
        try:
            timeit(name, fn)
        except Exception as e:
            print(f"{name:44s} FAILED: {str(e).splitlines()[0][:80]}",
                  flush=True)
    f32 = _mk_slab(jnp.float32, fma_form=False, packed_any=False)
    f32_fma = _mk_slab(jnp.float32, fma_form=True, packed_any=False)
    f32_packed = _mk_slab(jnp.float32, fma_form=False, packed_any=True)
    bf16 = _mk_slab(jnp.bfloat16, fma_form=False, packed_any=False)
    bf16_packed = _mk_slab(jnp.bfloat16, fma_form=False, packed_any=True)
    for name, fn in [
        ("slab f32 sub-mul, per-child any", f32),
        ("slab f32 FMA-form, per-child any", f32_fma),
        ("slab f32 sub-mul, packed-or any", f32_packed),
        ("slab bf16 sub-mul, per-child any", bf16),
        ("slab bf16 sub-mul, packed-or any", bf16_packed),
    ]:
        try:
            timeit(name, fn)
        except Exception as e:  # Mosaic layout bugs on some variants
            print(f"{name:44s} FAILED: {str(e).splitlines()[0][:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
