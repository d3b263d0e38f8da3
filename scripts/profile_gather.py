"""A/B the MXU one-hot gather: dot precision (HIGHEST 6-pass vs HIGH
3-pass vs DEFAULT 1-pass) and selector chunk size, for exactness and
speed at renderer shapes. One-hot selectors only ever multiply table
values by exactly 1.0, so lower-precision passes may already be exact —
this measures instead of assuming.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def run_case(T, C, N, chunk, precision, weighted=False):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((T, C)), jnp.float32)
    if weighted:
        ids = jnp.asarray(rng.integers(0, T, (N, 4)), jnp.int32)
        w = rng.random((N, 4)).astype(np.float32)
        w = jnp.asarray(w / w.sum(1, keepdims=True))
    else:
        ids = jnp.asarray(rng.integers(0, T, (N,)), jnp.int32)

    Tp = -(-T // chunk) * chunk
    tab = jnp.pad(table, ((0, Tp - T), (0, 0)))

    @jax.jit
    def mm_gather(tab, ids):
        idf = ids.astype(jnp.float32)
        cols = jnp.arange(chunk, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, C), jnp.float32)
        for t0 in range(0, Tp, chunk):
            if weighted:
                sel = jnp.zeros((N, chunk), jnp.float32)
                for k in range(4):
                    sel = sel + jnp.where(
                        idf[:, k : k + 1] == cols + t0, w[:, k : k + 1], 0.0)
            else:
                sel = (idf[:, None] == cols + t0).astype(jnp.float32)
            out = out + jax.lax.dot(sel, tab[t0 : t0 + chunk],
                                    precision=precision)
        return out

    out = np.asarray(mm_gather(tab, ids))
    if weighted:
        ref = np.zeros((N, C), np.float32)
        tnp = np.asarray(table)
        for k in range(4):
            ref += np.asarray(w)[:, k : k + 1] * tnp[np.asarray(ids)[:, k]]
        err = np.abs(out - ref).max()
    else:
        ref = np.asarray(table)[np.asarray(ids)]
        err = np.abs(out - ref).max()
    dt = timeit(lambda: mm_gather(tab, ids))
    tag = "wgt" if weighted else "1hot"
    print(f"{tag} T={T:5d} C={C:2d} chunk={chunk:3d} prec={precision:8s}"
          f"  {dt*1e3:7.3f} ms  maxerr={err:.3e}", flush=True)


def main():
    N = 262144
    for weighted in (False, True):
        for T, C in [(964, 32), (256, 8), (16, 16), (964, 48)]:
            for chunk, prec in [
                (512, "highest"), (512, "high"), (512, "default"),
                (128, "highest"), (128, "high"),
                (256, "highest"), (256, "high"),
            ]:
                if chunk > -(-T // 128) * 128 and chunk != 512:
                    continue
                run_case(T, C, N, chunk, prec, weighted)
        print()


if __name__ == "__main__":
    main()
