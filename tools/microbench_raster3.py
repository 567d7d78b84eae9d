"""Rasterizer stage dissection on realistic (clustered) data.

M1 pack payload   M2 sort(k+2/k+3)   M3 searchsorted   M4 bin gather
width/row-count scaling (is gather row-bound or byte-bound?)   M5 splat
window sizes   M6 overlap-add   M7 full rasterize_tiled as shipped.

Usage: python tools/microbench_raster3.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
H, W = 1080, 1920
ITERS = 200


def fence(x):
    x = x.reshape(-1)
    return float(jnp.max(x[:: max(1, int(x.shape[0]) // 997 * 2 + 1)]
                         ).astype(jnp.float32))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:56s} {dt * 1e3:9.3f} ms/iter")
    return dt


def loop(body):
    @jax.jit
    def run(*args):
        return lax.fori_loop(0, ITERS, lambda i, c: body(i, c, *args[1:]),
                             args[0])

    return run


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    key = jax.random.key(1)
    kx, ky, kc = jax.random.split(key, 3)
    xs = jax.random.uniform(kx, (N,), jnp.float32, 0.0, W)
    ys = jax.random.uniform(ky, (N,), jnp.float32, 0.0, H)
    colors = jax.random.uniform(kc, (N, 4), jnp.float32)
    size = jax.random.uniform(key, (N,), jnp.float32, 1.0, 6.0)
    live = jnp.ones((N,), bool)

    from illuminant_tpu.raster import tiled as T

    cfg = T.TiledRasterConfig(height=H, width=W, tile=32,
                              bin_capacity=1024, apron=4, kernel="gauss")
    gy, gx = cfg.grid
    NT = gy * gx

    if want("M1"):
        def body(i, c):
            x = xs + i * 0.0
            txi = jnp.clip((x / 32).astype(jnp.int32), 0, gx - 1)
            tyi = jnp.clip((ys / 32).astype(jnp.int32), 0, gy - 1)
            keyk = tyi * gx + txi
            o1 = T._pack_xy(x, ys)
            o2 = T._pack_rgba8(colors, 4.0)
            o3 = T._pack_bf16_pair(size, jnp.zeros_like(size))
            return c + (keyk[0] + o1[0] + o2[0] + o3[0]).astype(jnp.float32) * 1e-30

        timed("M1 key + payload pack", loop(body), jnp.zeros((), jnp.float32))

    tile = (ys.astype(jnp.int32) // 32) * gx + xs.astype(jnp.int32) // 32
    o1 = T._pack_xy(xs, ys)
    o2 = T._pack_rgba8(colors, 4.0)
    o3 = T._pack_bf16_pair(size, jnp.zeros_like(size))

    if want("M2"):
        def body2(i, carry):
            k, a, b = carry
            return lax.sort((k + i * 0, a, b), num_keys=1)

        timed("M2a sort key + 2 int32", loop(body2), (tile, o1, o2))

        def body3(i, carry):
            k, a, b, c = carry
            return lax.sort((k + i * 0, a, b, c), num_keys=1)

        timed("M2b sort key + 3 int32", loop(body3), (tile, o1, o2, o3))

    skey, s1, s2, s3 = lax.sort((tile, o1, o2, o3), num_keys=1)
    payload3 = jnp.stack([s1, s2, s3], axis=-1)
    payload2 = jnp.stack([s1, s2], axis=-1)

    if want("M3"):
        def body(i, c):
            return jnp.searchsorted(
                skey, jnp.arange(NT + 1, dtype=jnp.int32)
            ).astype(jnp.int32) + i * 0

        timed(f"M3 searchsorted {NT+1} starts", loop(body),
              jnp.zeros((NT + 1,), jnp.int32))

    starts = jnp.searchsorted(skey, jnp.arange(NT + 1, dtype=jnp.int32)
                              ).astype(jnp.int32)[:-1]
    base = jnp.minimum(starts, N - 1024)

    if want("M4"):
        for K in (512, 1024):
            for pay, pw in ((payload2, 2), (payload3, 3)):
                b2 = jnp.minimum(starts, N - K)

                def body(i, c, pay=pay, K=K, b2=b2, pw=pw):
                    def get(s):
                        return lax.dynamic_slice(pay, (s + i * 0, 0),
                                                 (K, pw))
                    return jax.vmap(get)(b2)

                timed(f"M4 gather NT={NT} K={K} rows of {pw} int32",
                      loop(body),
                      jnp.zeros((NT, K, pw), jnp.int32))

        # Row-packing test: same bytes, half the rows (2 slots / row).
        pay6 = payload3.reshape(N // 2, 6)
        b3 = jnp.minimum(starts // 2, N // 2 - 512)

        def body6(i, c):
            def get(s):
                return lax.dynamic_slice(pay6, (s + i * 0, 0), (512, 6))
            return jax.vmap(get)(b3)

        timed("M4p gather K=1024-as-512 rows of 6 int32 (2 slots/row)",
              loop(body6), jnp.zeros((NT, 512, 6), jnp.int32))

    if want("M7"):
        def body(i, c):
            img, diag = T.rasterize_tiled(cfg, xs + i * 0.0, ys, colors,
                                          size, live)
            return c + img * 1e-30

        timed("M7 rasterize_tiled shipped (uniform data)", loop(body),
              jnp.zeros((H, W, 4), jnp.float32))


if __name__ == "__main__":
    main()
