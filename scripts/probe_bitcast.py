"""Probe: scalar decode ops needed by the quantized traversal rows.

Finding (round 4): scalar `lax.bitcast_convert_type` is NOT supported by
Mosaic ('tpu.bitcast' requires vector operands), so bf16-bits-in-i32 rows
are out for scalar decode. The all-integer design below needs no bitcast:

  * frame boxes     -> fixed-point i32 (global scene scale), decode w * s
  * child bounds    -> u16 in the node's own box frame, decode lo + q * sc
  * vertex positions-> u16 in the leaf box frame, same decode
  * ptrs / tri ids  -> exact i32

Checks, on the real TPU, that a Pallas kernel can:
  a) DMA an int32 row HBM -> SMEM at odd row widths (40/56/64/72/80)
  b) read int32 scalars from SMEM and do shifts/masks/converts
  c) scalar int -> float convert + FMA decode (the quantized path)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(rowlen):
    def kernel(rows_ref, out_ref, srow, fstack, sem):
        pltpu.make_async_copy(rows_ref.at[1], srow, sem).start()
        pltpu.make_async_copy(rows_ref.at[1], srow, sem).wait()

        # fixed-point i32 -> f32: v = w * s
        fstack[0] = np.float32(1.0 / (1 << 20))
        w0 = srow[0]
        fa = w0.astype(jnp.float32) * fstack[0]

        # u16 halves -> f32 convert + fma with f32 SMEM stack values
        fstack[1] = 2.5
        fstack[2] = 0.125
        q = srow[1]
        lo_q = (q & 0xFFFF).astype(jnp.float32)
        hi_q = ((q >> 16) & 0xFFFF).astype(jnp.float32)
        v_lo = fstack[1] + lo_q * fstack[2]
        v_hi = fstack[1] + hi_q * fstack[2]

        # exact i32 passthrough (ptr / tid)
        p = srow[rowlen - 1].astype(jnp.float32)

        out_ref[0] = jnp.full_like(out_ref[0], fa)
        out_ref[1] = jnp.full_like(out_ref[1], v_lo)
        out_ref[2] = jnp.full_like(out_ref[2], v_hi)
        out_ref[3] = jnp.full_like(out_ref[3], p)

    return kernel


def run(rowlen):
    rows = np.zeros((4, rowlen), np.uint32)
    rows[1, 0] = np.int64(round(-3.25 * (1 << 20))).astype(np.uint32)
    rows[1, 1] = np.uint32(7 | (65535 << 16))
    rows[1, rowlen - 1] = 1234567
    rows = rows.view(np.int32)
    rows = jnp.asarray(rows)

    out = pl.pallas_call(
        make_kernel(rowlen),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((rowlen,), jnp.int32),
            pltpu.SMEM((8,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(rows)
    got = np.asarray(out)[:, 0]
    want = [-3.25, 2.5 + 7 * 0.125, 2.5 + 65535 * 0.125, 1234567.0]
    ok = np.allclose(got, want)
    print(f"rowlen={rowlen:3d}: {'PASS' if ok else 'FAIL'}  got={got}")
    return ok


def main():
    all_ok = True
    for rowlen in (40, 56, 64, 72, 80, 128):
        try:
            all_ok &= run(rowlen)
        except Exception as e:
            all_ok = False
            print(f"rowlen={rowlen:3d}: ERROR {str(e)[:200]}")
    print("overall:", "PASS" if all_ok else "FAIL")


if __name__ == "__main__":
    main()
