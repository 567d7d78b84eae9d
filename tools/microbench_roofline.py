"""Roofline probes: what does a pass over 1M-element arrays really cost?

Establishes the per-pass floor (bandwidth + per-op overhead) that all
per-particle work pays, so optimization targets element count / pass count
/ dtype with real coefficients.

Usage: python tools/microbench_roofline.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
ITERS = 500


def fence(x):
    x = jax.tree_util.tree_leaves(x)[0].reshape(-1)
    return float(jnp.max(x[:: max(1, int(x.shape[0]) // 997 * 2 + 1)]))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:56s} {dt * 1e3:9.3f} ms/iter")
    return dt


def loop(body):
    @jax.jit
    def run(*args):
        return lax.fori_loop(0, ITERS, lambda i, c: body(i, c), args[0])

    return run


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    key = jax.random.key(0)
    x1 = jax.random.uniform(key, (N,), jnp.float32)
    x4 = jax.random.uniform(key, (N, 4), jnp.float32)
    x2d = jax.random.uniform(key, (1024, 1024), jnp.float32)

    if want("copy"):
        timed("R1 x+1 on (1M,) f32", loop(lambda i, c: c + 1.0), x1)
        timed("R2 x+1 on (1M,4) f32", loop(lambda i, c: c + 1.0), x4)
        timed("R3 x+1 on (1024,1024) f32", loop(lambda i, c: c + 1.0), x2d)
        timed("R4 x+1 on (1M,) bf16",
              loop(lambda i, c: c + 1.0), x1.astype(jnp.bfloat16))

        def chain(i, c):
            for _ in range(20):
                c = c * 1.000001 + 1e-7
            return c

        timed("R5 20-op chain on (1M,) f32", loop(chain), x1)

        def chain4(i, c):
            for _ in range(20):
                c = c * 1.000001 + 1e-7
            return c

        timed("R6 20-op chain on (1M,4) f32", loop(chain4), x4)

    if want("multi"):
        # 8 independent (1M,) planes updated per step (the planar-state
        # shape of the particle pipeline).
        planes = tuple(x1 + i for i in range(8))

        def body(i, c):
            return tuple(p * 1.000001 + 1e-7 for p in c)

        timed("R7 8 planes x 1 op (1M,) f32", loop(body), planes)

        def body2(i, c):
            s = c[0]
            for p in c[1:]:
                s = s + p
            return (s,) + c[1:]

        timed("R8 read 8 planes sum -> 1 (1M,)", loop(body2), planes)

    if want("trig"):
        def body(i, c):
            return jnp.sqrt(jnp.abs(c) + 1.0) * 0.999

        timed("R9 sqrt+abs (1M,) f32", loop(body), x1)

        def body2(i, c):
            return c / jnp.sqrt(c * c + 1.0)

        timed("R10 rsqrt-ish (1M,) f32", loop(body2), x1)

    if want("eval"):
        # Minimal analytic-scene-like eval: 6 box SDFs + min, planar.
        import numpy as np
        centers = jnp.asarray(np.random.rand(6, 3) * 1000, jnp.float32)
        sizes = jnp.asarray(np.random.rand(6, 3) * 50 + 10, jnp.float32)
        px = x1 * 1920.0
        py = jax.random.uniform(jax.random.key(1), (N,)) * 1080.0
        pz = jax.random.uniform(jax.random.key(2), (N,)) * 64.0

        def sd_box_p(x, y, z, bx, by, bz):
            qx = jnp.abs(x) - bx
            qy = jnp.abs(y) - by
            qz = jnp.abs(z) - bz
            outside = jnp.sqrt(
                jnp.maximum(qx, 0.0) ** 2 + jnp.maximum(qy, 0.0) ** 2
                + jnp.maximum(qz, 0.0) ** 2)
            inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
            return outside + inside

        def body(i, c):
            x, y, z = c
            d = jnp.full((N,), 128.0, jnp.float32)
            for k in range(6):
                d = jnp.minimum(d, sd_box_p(
                    x - centers[k, 0], y - centers[k, 1], z - centers[k, 2],
                    sizes[k, 0], sizes[k, 1], sizes[k, 2]))
            return (x + d * 1e-9, y, z)

        timed("R11 6-box scene eval (1M,) planar", loop(body),
              (px, py, pz))


if __name__ == "__main__":
    main()
