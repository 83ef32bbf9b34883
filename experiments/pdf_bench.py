"""Microbench: CDF-inversion formulations for sample_pdf on TPU."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R, S, N = 8192, 256, 97
ITERS = 10


def bench(fn, label, *args):
    float(jnp.sum(fn(0, *args)))
    float(jnp.sum(fn(1, *args)))
    t0 = time.perf_counter()
    outs = [fn(2 + i, *args) for i in range(ITERS)]
    s = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    print(f"{label:46s}: {dt*1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    w0 = jax.random.uniform(key, (R, S))
    edges = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
    u = jnp.broadcast_to((jnp.arange(N) + 0.5) / N, (R, N))

    def prep(i, w):
        w = w + 1e-6 * i + 0.01
        pdf = w / w.sum(-1, keepdims=True)
        cdf = jnp.concatenate([jnp.zeros((R, 1)), jnp.cumsum(pdf, -1)], -1)
        return jnp.clip(cdf, 0, 1)

    @jax.jit
    def lane_reduce(i, w):
        cdf = prep(i, w)
        idx = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), -1) - 1
        idx = jnp.clip(idx, 0, S - 1)
        c0 = jnp.take_along_axis(cdf, idx, -1)
        c1 = jnp.take_along_axis(cdf, idx + 1, -1)
        e0 = jnp.take_along_axis(edges, idx, -1)
        e1 = jnp.take_along_axis(edges, idx + 1, -1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        return e0 + frac * (e1 - e0)

    bench(lane_reduce, "compare-reduce over lane axis (current)", w0)

    @jax.jit
    def mid_reduce(i, w):
        cdf = prep(i, w)
        idx = jnp.sum((cdf[:, :, None] <= u[:, None, :]).astype(jnp.int32), 1) - 1
        idx = jnp.clip(idx, 0, S - 1)
        c0 = jnp.take_along_axis(cdf, idx, -1)
        c1 = jnp.take_along_axis(cdf, idx + 1, -1)
        e0 = jnp.take_along_axis(edges, idx, -1)
        e1 = jnp.take_along_axis(edges, idx + 1, -1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        return e0 + frac * (e1 - e0)

    bench(mid_reduce, "compare-reduce over middle axis", w0)

    @jax.jit
    def matmul_count(i, w):
        # idx via bf16 matmul: count = (cdf<=u) as sum over S of step fn;
        # step via compare then MXU reduce with ones
        cdf = prep(i, w)
        cmp = (cdf[:, None, :] <= u[:, :, None]).astype(jnp.bfloat16)
        idx = jnp.einsum("rns->rn", cmp).astype(jnp.int32) - 1
        idx = jnp.clip(idx, 0, S - 1)
        c0 = jnp.take_along_axis(cdf, idx, -1)
        c1 = jnp.take_along_axis(cdf, idx + 1, -1)
        e0 = jnp.take_along_axis(edges, idx, -1)
        e1 = jnp.take_along_axis(edges, idx + 1, -1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        return e0 + frac * (e1 - e0)

    bench(matmul_count, "compare + bf16 reduce", w0)

    # pieces
    @jax.jit
    def idx_only(i, w):
        cdf = prep(i, w)
        return jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), -1)

    bench(idx_only, "idx compare-reduce only", w0)

    @jax.jit
    def gathers_only(i, w):
        cdf = prep(i, w)
        idx = jnp.clip((u * S).astype(jnp.int32) + (i % 2), 0, S - 1)
        c0 = jnp.take_along_axis(cdf, idx, -1)
        c1 = jnp.take_along_axis(cdf, idx + 1, -1)
        e0 = jnp.take_along_axis(edges, idx, -1)
        e1 = jnp.take_along_axis(edges, idx + 1, -1)
        return c0 + c1 + e0 + e1

    bench(gathers_only, "4x take_along_axis only", w0)

    @jax.jit
    def cdf_only(i, w):
        return prep(i, w)

    bench(cdf_only, "cdf build only (cumsum)", w0)


if __name__ == "__main__":
    main()


def extra():
    key = jax.random.PRNGKey(0)
    w0 = jax.random.uniform(key, (R, S))
    edges = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
    u = jnp.broadcast_to((jnp.arange(N) + 0.5) / N, (R, N))

    def prep(i, w):
        w = w + 1e-6 * i + 0.01
        pdf = w / w.sum(-1, keepdims=True)
        cdf = jnp.concatenate([jnp.zeros((R, 1)), jnp.cumsum(pdf, -1)], -1)
        return jnp.clip(cdf, 0, 1)

    @jax.jit
    def gather_free(i, w):
        cdf = prep(i, w)
        le = cdf[:, :, None] <= u[:, None, :]  # (R, S+1, N)
        c = cdf[:, :, None]
        e = edges[:, :, None]
        c0 = jnp.max(jnp.where(le, c, 0.0), axis=1)
        e0 = jnp.max(jnp.where(le, e, -jnp.inf), axis=1)
        c1 = jnp.min(jnp.where(le, jnp.inf, c), axis=1)
        e1 = jnp.min(jnp.where(le, jnp.inf, e), axis=1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        return e0 + frac * (e1 - e0)

    bench(gather_free, "gather-free masked reductions (mid axis)", w0)

    # correctness vs current formulation
    @jax.jit
    def lane_reduce(i, w):
        cdf = prep(i, w)
        idx = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), -1) - 1
        idx = jnp.clip(idx, 0, S - 1)
        c0 = jnp.take_along_axis(cdf, idx, -1)
        c1 = jnp.take_along_axis(cdf, idx + 1, -1)
        e0 = jnp.take_along_axis(edges, idx, -1)
        e1 = jnp.take_along_axis(edges, idx + 1, -1)
        frac = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0)
        return e0 + frac * (e1 - e0)

    a = gather_free(0, w0)
    b = lane_reduce(0, w0)
    err = float(jnp.abs(a - b).max())
    print(f"gather-free vs current max diff: {err:.2e}")


if __name__ == "__main__":
    extra()
