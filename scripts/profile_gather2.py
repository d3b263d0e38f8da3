"""A/B new MXU-gather formulations against the current ones, at the real
renderer shapes (262k lanes; tri_shade [964,48] f32; material atlas
[128,8] bf16 with a 4-tap bilinear filter).

The device tunnel has a ~25 ms per-dispatch floor, so each variant runs
K=40 times inside ONE dispatch (lax.fori_loop with a data dependence
through the ids so nothing folds away); reported cost is
(loop_time - empty_loop_time) / K.

Hypotheses under test:
  1. The HIGHEST-precision (6-pass) matmul and the f32 selector dominate
     gather cost. A bf16 selector (one-hot is exactly representable)
     halves the big operand, and a build-time hi/lo/re bf16 split of the
     f32 table makes DEFAULT-precision matmuls exact.
  2. The bilinear 4-hot selector costs 4x the compare/select work of a
     1-hot. With wrap-border-padded tables the 4 taps are fixed shifts
     of one base id, so ONE selector contracted against a
     channel-concatenated [chunk, 4*C] shifted table slice fetches all
     4 taps; filter weights apply per-lane afterwards.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N = 262144
K = 40


def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def looped(gather_fn, ids0, T):
    """Run gather_fn K times with ids permuted from the prior output."""

    @jax.jit
    def run(ids0):
        def body(i, carry):
            ids, acc = carry
            out = gather_fn(ids)
            # data dependence: derive next ids from the output
            nxt = (ids + i + out[:, 0].astype(jnp.int32)) % T
            return nxt, acc + out[0, 0]

        _, acc = jax.lax.fori_loop(0, K, body, (ids0, jnp.float32(0)))
        return acc

    return lambda: run(ids0)


def empty_floor(ids0, T):
    @jax.jit
    def run(ids0):
        def body(i, carry):
            ids, acc = carry
            return (ids + i) % T, acc + 1.0

        _, acc = jax.lax.fori_loop(0, K, body, (ids0, jnp.float32(0)))
        return acc

    return timeit(lambda: run(ids0))


def report(name, dt, floor, err=None):
    per = (dt - floor) / K * 1e3
    e = f"  maxrelerr={err:.3e}" if err is not None else ""
    print(f"{name:52s} {per:7.3f} ms/call{e}", flush=True)


def rel_err(out, ref):
    return float(np.max(np.abs(out - ref) / (np.abs(ref) + 1e-3)))


def onehot_cases(T=964, C=48):
    rng = np.random.default_rng(0)
    table_np = rng.standard_normal((T, C)).astype(np.float32)
    ids0 = jnp.asarray(rng.integers(0, T, (N,)), jnp.int32)
    chunk = 512
    Tp = -(-T // chunk) * chunk
    tab = jnp.pad(jnp.asarray(table_np), ((0, Tp - T), (0, 0)))

    floor = empty_floor(ids0, T)
    print(f"(dispatch floor: {floor*1e3:.1f} ms)")

    def current(ids):
        idf = ids.astype(jnp.float32)[:, None]
        cols = jnp.arange(chunk, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, C), jnp.float32)
        for t0 in range(0, Tp, chunk):
            sel = (idf == cols + t0).astype(jnp.float32)
            out = out + jax.lax.dot(sel, tab[t0:t0 + chunk],
                                    precision="highest")
        return out

    hi = tab.astype(jnp.bfloat16)
    lo_f = tab - hi.astype(jnp.float32)
    lo = lo_f.astype(jnp.bfloat16)
    re = (lo_f - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    cat3 = jnp.concatenate([hi, lo, re], axis=1)

    def split3(ids):
        idf = ids.astype(jnp.float32)[:, None]
        cols = jnp.arange(chunk, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, 3 * C), jnp.float32)
        for t0 in range(0, Tp, chunk):
            sel = (idf == cols + t0).astype(jnp.bfloat16)
            out = out + jax.lax.dot(sel, cat3[t0:t0 + chunk],
                                    preferred_element_type=jnp.float32)
        return out[:, :C] + out[:, C:2 * C] + out[:, 2 * C:]

    def split2(ids):
        idf = ids.astype(jnp.float32)[:, None]
        cols = jnp.arange(chunk, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, 2 * C), jnp.float32)
        cat2 = cat3[:, :2 * C]
        for t0 in range(0, Tp, chunk):
            sel = (idf == cols + t0).astype(jnp.bfloat16)
            out = out + jax.lax.dot(sel, cat2[t0:t0 + chunk],
                                    preferred_element_type=jnp.float32)
        return out[:, :C] + out[:, C:2 * C]

    def native(ids):
        return tab[ids]

    cases = [("1hot current: f32 sel, HIGHEST", current),
             ("1hot bf16 sel, 3-split cat, DEFAULT", split3),
             ("1hot bf16 sel, 2-split cat, DEFAULT", split2),
             ("1hot native XLA gather", native)]
    ref = table_np[np.asarray(ids0)]
    for name, fn in cases:
        err = rel_err(np.asarray(jax.jit(fn)(ids0)), ref)
        dt = timeit(looped(fn, ids0, T))
        report(name, dt, floor, err)


def bilinear_cases(T=128, C=8):
    rng = np.random.default_rng(1)
    table_bf = jnp.asarray(rng.random((T, C)), jnp.bfloat16)
    table_np = np.asarray(table_bf, np.float32)
    ids0 = jnp.asarray(rng.integers(0, T - 10, (N,)), jnp.int32)
    shifts = (0, 1, 8, 9)
    w = rng.random((N, 4)).astype(np.float32)
    w = w / w.sum(1, keepdims=True)
    wj = jnp.asarray(w)

    chunk = 128
    Tp = -(-T // chunk) * chunk
    tabf32 = jnp.pad(jnp.asarray(table_np), ((0, Tp - T), (0, 0)))
    tab_bf = jnp.pad(table_bf, ((0, Tp - T + 16), (0, 0)))  # shift slack

    floor = empty_floor(ids0, T - 10)

    def current(base):
        ids4 = jnp.stack([base + s for s in shifts], axis=1)
        idf = ids4.astype(jnp.float32)
        cols = jnp.arange(chunk, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, C), jnp.float32)
        for t0 in range(0, Tp, chunk):
            sel = jnp.zeros((N, chunk), jnp.float32)
            for k in range(4):
                sel = sel + jnp.where(idf[:, k:k + 1] == cols + t0,
                                      wj[:, k:k + 1], 0.0)
            out = out + jax.lax.dot(sel, tabf32[t0:t0 + chunk],
                                    precision="highest")
        return out

    def shared(base):
        idf = base.astype(jnp.float32)[:, None]
        cols = jnp.arange(chunk, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, 4 * C), jnp.float32)
        for t0 in range(0, Tp, chunk):
            sel = (idf == cols + t0).astype(jnp.bfloat16)
            cat = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(tab_bf, t0 + s, chunk)
                 for s in shifts], axis=1)
            out = out + jax.lax.dot(sel, cat,
                                    preferred_element_type=jnp.float32)
        acc = jnp.zeros((N, C), jnp.float32)
        for k in range(4):
            acc = acc + wj[:, k:k + 1] * out[:, k * C:(k + 1) * C]
        return acc

    ref = np.zeros((N, C), np.float32)
    b = np.asarray(ids0)
    for k, s in enumerate(shifts):
        ref += w[:, k:k + 1] * table_np[b + s]

    for name, fn in [("bilin current: 4-hot f32 sel, HIGHEST", current),
                     ("bilin shared bf16 sel, cat-shift, DEFAULT", shared)]:
        err = rel_err(np.asarray(jax.jit(fn)(ids0)), ref)
        dt = timeit(looped(fn, ids0, T - 10))
        report(name, dt, floor, err)


def main():
    print(f"device: {jax.devices()[0]}")
    onehot_cases()
    print()
    bilinear_cases()


if __name__ == "__main__":
    main()
