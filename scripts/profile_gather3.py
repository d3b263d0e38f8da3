"""Native-gather cost at room scale: [184k, C] f32 table, 262k random ids.

Hypothesis from profile_room.py: the per-bounce _decode_hit gather of
tri_shade rows dominates the room's shading glue (~70 ms). Measures the
native gather at several row widths, with random vs sorted ids, plus the
multi-operand-sort roundtrip that would bracket a sorted-gather scheme.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.core.sortutil import sort_lanes

K = 10
T = 184_332
N = 262_144


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, T, N), jnp.int32)
    ids_sorted = jnp.sort(ids)

    @jax.jit
    def empty(i):
        def body(_, c):
            return (c[0] + 1) % T, c[1] + 1.0

        return jax.lax.fori_loop(0, K, body, (i, jnp.float32(0)))[1]

    floor = timeit(lambda: empty(ids))

    def report(name, dt):
        print(f"{name:46s} {(dt - floor)/K*1e3:8.2f} ms", flush=True)

    for C in (48, 24, 12):
        tab = jnp.asarray(rng.randn(T, C), jnp.float32)

        def loop(idv):
            @jax.jit
            def run(i0):
                def body(_, carry):
                    i, acc = carry
                    rows = tab[i]
                    s = jnp.sum(rows[:, 0])
                    return (i + s.astype(jnp.int32) % 2) % T, acc + s

                return jax.lax.fori_loop(0, K, body,
                                         (i0, jnp.float32(0)))[1]

            return lambda: run(idv)

        report(f"native gather [{T},{C}] random ids", timeit(loop(ids)))
        report(f"native gather [{T},{C}] sorted ids",
               timeit(loop(ids_sorted)))

    # bf16 table at 48 cols (half the bytes)
    tab16 = jnp.asarray(rng.randn(T, 48), jnp.bfloat16)

    @jax.jit
    def run16(i0):
        def body(_, carry):
            i, acc = carry
            rows = tab16[i].astype(jnp.float32)
            s = jnp.sum(rows[:, 0])
            return (i + s.astype(jnp.int32) % 2) % T, acc + s

        return jax.lax.fori_loop(0, K, body, (i0, jnp.float32(0)))[1]

    report("native gather bf16 [T,48] random ids",
           timeit(lambda: run16(ids)))

    # sort + gather + unsort bracket
    @jax.jit
    def run_sorted_roundtrip(i0):
        def body(_, carry):
            i, acc = carry
            iota = jnp.arange(N, dtype=jnp.int32)
            _, (ii, io) = sort_lanes(i, [i, iota])
            tab48 = tab16
            rows = tab48[ii].astype(jnp.float32)
            _, (r0,) = sort_lanes(io, [rows[:, 0]])
            s = jnp.sum(r0)
            return (i + s.astype(jnp.int32) % 2) % T, acc + s

        return jax.lax.fori_loop(0, K, body, (i0, jnp.float32(0)))[1]

    report("sort + bf16 gather + unsort(1col)",
           timeit(lambda: run_sorted_roundtrip(ids)))


if __name__ == "__main__":
    main()
