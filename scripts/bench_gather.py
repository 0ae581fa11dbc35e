"""Compare TPU lowerings of the per-keypoint descriptor gather (r4: the
scattered XLA gather is ~0.3 ms/(frame*stream) for a mere 24.5k elements —
the single largest line after attribution; see BASELINE.md breakdown).

Variants, each timed inside a scan like the production step (S streams
vmapped, carry-dependent indices so nothing hoists):

    scatter      planes[:, y, x].T            (production r3/r4 path)
    flat-take    jnp.take on flattened planes (same class)
    slice8       planes interleaved [H, W*8] (XLA transpose) + vmapped
                 dynamic_slice of 8 CONTIGUOUS words per keypoint
    slice8-pre   same but interleaving excluded from the timed region
                 (what a kernel-B-side interleaved layout would give)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather.py [--s 8]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

H, W, K = 376, 1241, 1536
ITERS = 8


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / n * 1e3


def scan_of(body, *xs):
    @jax.jit
    def run(c0, *xs):
        def f(c, _):
            return c + 1, body(c, *xs)
        _, outs = jax.lax.scan(f, c0, jnp.arange(ITERS))
        return outs
    return run


def main():
    s = int(sys.argv[sys.argv.index("--s") + 1]) if "--s" in sys.argv else 8
    rs = np.random.RandomState(0)
    planes = jnp.asarray(
        rs.randint(0, 2**32, (s, 8, H, W), np.uint64).astype(np.uint32))
    y = jnp.asarray(rs.randint(20, H - 20, (s, K)).astype(np.int32))
    x = jnp.asarray(rs.randint(20, W - 20, (s, K)).astype(np.int32))

    def scatter(c, planes, y, x):
        def one(p, yy, xx):
            yy = jnp.clip(yy + c, 0, H - 1)
            return p[:, yy, xx].T.sum(dtype=jnp.uint32)
        return jax.vmap(one)(planes, y, x)

    def flat_take(c, planes, y, x):
        def one(p, yy, xx):
            yy = jnp.clip(yy + c, 0, H - 1)
            flat = p.reshape(8, -1)
            return jnp.take(flat, yy * W + xx, axis=1).sum(dtype=jnp.uint32)
        return jax.vmap(one)(planes, y, x)

    def slice8(c, planes, y, x):
        def one(p, yy, xx):
            yy = jnp.clip(yy + c, 0, H - 1)
            pi = p.transpose(1, 2, 0).reshape(H, W * 8)
            d = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
                pi, (a, b * 8), (1, 8)))(yy, xx)
            return d.sum(dtype=jnp.uint32)
        return jax.vmap(one)(planes, y, x)

    planes_i = jnp.asarray(
        np.asarray(planes).transpose(0, 2, 3, 1).reshape(s, H, W * 8))

    def slice8_pre(c, pi_all, y, x):
        def one(pi, yy, xx):
            yy = jnp.clip(yy + c, 0, H - 1)
            d = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
                pi, (a, b * 8), (1, 8)))(yy, xx)
            return d.sum(dtype=jnp.uint32)
        return jax.vmap(one)(pi_all, y, x)

    for name, fn, args in [
        ("scatter", scatter, (planes, y, x)),
        ("flat-take", flat_take, (planes, y, x)),
        ("slice8", slice8, (planes, y, x)),
        ("slice8-pre", slice8_pre, (planes_i, y, x)),
    ]:
        ms = timeit(scan_of(fn, *args), jnp.int32(0), *args)
        per = ms / (ITERS * s)
        print(f"S={s} {name:10s} {ms:8.2f} ms/scan  "
              f"{per * 1e3:8.1f} us/(iter*stream)", flush=True)


if __name__ == "__main__":
    main()
