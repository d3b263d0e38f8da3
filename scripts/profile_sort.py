"""Cost of the resort/compaction primitives at renderer lane counts.

The round-2 notes recorded "argsort+gather ~0.2 ms at 262k lanes"; the
round-3 shadow A/B (profile_shadow.py) implies the sorted dispatch costs
~25 ms at 524k. This measures each primitive in-graph (looped):
  * jnp.argsort of i32 keys
  * cumsum-based stable dead/live partition permutation (no sort)
  * gather of one f32 lane array by a permutation
  * scatter (inverse apply) by a permutation
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

K = 30


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    for N in (262144, 524288):
        rng = np.random.default_rng(0)
        keys0 = jnp.asarray(rng.integers(0, 1 << 11, N), jnp.int32)
        live0 = jnp.asarray(rng.random(N) < 0.27)
        x0 = jnp.asarray(rng.random(N).astype(np.float32))
        perm0 = jnp.asarray(rng.permutation(N).astype(np.int32))

        def loop(fn, seed):
            @jax.jit
            def run(s):
                def body(i, carry):
                    v, acc = carry
                    out = fn(v)
                    return v + out * 1e-20, acc + out

                _, acc = jax.lax.fori_loop(
                    0, K, body, (s, jnp.float32(0)))
                return acc

            return lambda: run(seed)

        @jax.jit
        def empty(v):
            def body(i, c):
                return c[0] * 1.0000001, c[1] + 1.0

            return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]

        floor = timeit(lambda: empty(x0))

        def report(name, dt):
            print(f"N={N}: {name:40s} {(dt - floor)/K*1e3:8.3f} ms",
                  flush=True)

        report("argsort i32 keys", timeit(loop(
            lambda v: jnp.argsort(keys0 + (v[0] * 1e-20).astype(jnp.int32)
                                  )[0].astype(jnp.float32), x0)))

        def partition(v):
            live = live0 | (v[0] > 2.0)  # dependence
            nl = jnp.cumsum(live.astype(jnp.int32))
            total = nl[-1]
            slot = jnp.where(
                live, nl - 1,
                total + jnp.cumsum((~live).astype(jnp.int32)) - 1)
            return slot[0].astype(jnp.float32)

        report("cumsum stable partition (slots)", timeit(loop(partition, x0)))

        report("gather f32 by perm", timeit(loop(
            lambda v: v[perm0][0], x0)))

        report("scatter f32 by perm (.at.set)", timeit(loop(
            lambda v: jnp.zeros_like(v).at[perm0].set(v)[0], x0)))

        n8 = N // 8

        report("argsort i32 keys (N/8)", timeit(loop(
            lambda v: jnp.argsort(
                keys0[:n8] + (v[0] * 1e-20).astype(jnp.int32)
            )[0].astype(jnp.float32), x0)))


if __name__ == "__main__":
    main()


def multiop():
    """Multi-operand lax.sort: permute all payloads in ONE sort pass
    instead of argsort + k gathers."""
    import jax.lax as lax

    for N in (262144, 524288):
        rng = np.random.default_rng(1)
        keys0 = jnp.asarray(rng.integers(0, 1 << 11, N), jnp.int32)
        pay = [jnp.asarray(rng.random(N).astype(np.float32))
               for _ in range(9)]
        x0 = pay[0]

        @jax.jit
        def empty(v):
            def body(i, c):
                return c[0] * 1.0000001, c[1] + 1.0

            return jax.lax.fori_loop(0, K, body, (v, jnp.float32(0)))[1]

        floor = timeit(lambda: empty(x0))

        def loop(fn, seed):
            @jax.jit
            def run(s):
                def body(i, carry):
                    v, acc = carry
                    out = fn(v)
                    return v + out * 1e-20, acc + out

                _, acc = jax.lax.fori_loop(0, K, body,
                                           (s, jnp.float32(0)))
                return acc

            return lambda: run(seed)

        def report(name, dt):
            print(f"N={N}: {name:40s} {(dt - floor)/K*1e3:8.3f} ms",
                  flush=True)

        def sort9(v):
            k = keys0 + (v[0] * 1e-20).astype(jnp.int32)
            out = lax.sort([k] + [p + v[0] * 1e-20 for p in pay],
                           num_keys=1)
            return sum(o[0] for o in out[1:])

        report("lax.sort 1 key + 9 f32 payloads", timeit(loop(sort9, x0)))

        def sort3(v):
            k = keys0 + (v[0] * 1e-20).astype(jnp.int32)
            out = lax.sort([k, pay[0] + v[0] * 1e-20, pay[1], pay[2]],
                           num_keys=1)
            return out[1][0] + out[2][0] + out[3][0]

        report("lax.sort 1 key + 3 f32 payloads", timeit(loop(sort3, x0)))


multiop()
