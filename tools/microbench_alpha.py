"""Ordered-alpha compositing cost sweep (VERDICT r2 weak 6).

Both 'over' paths composite bin slots SEQUENTIALLY per tile
(lax.scan over bin_capacity slots — raster/tiled.py:668,
raster/sprites.py:328), so their cost is O(bin_capacity) regardless of
occupancy. This sweep records where that falls over at 1080p:

  A1 rasterize_tiled_alpha   K in {64, 128, 256, 512}, N = 256k
  A2 rasterize_sprites_alpha (rank-3 textured)        same sweep
  A3 occupancy independence  (N = 16k vs 256k at fixed K)

Usage: python tools/microbench_alpha.py [A1 A2 A3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 1080, 1920
ITERS = 100


def fence(x):
    return float(jnp.max(x[0, :64, 0].astype(jnp.float32)))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:58s} {dt * 1e3:9.3f} ms/iter", flush=True)
    return dt


def loop(body):
    # Carry-chained: the rasterized image feeds the next iteration's
    # positions, so XLA cannot hoist the body (measurement-trap rule).
    @jax.jit
    def run(img0, *args):
        def step(i, img):
            return body(img[0, 0, 0] * 1e-30, *args)
        return lax.fori_loop(0, ITERS, step, img0)

    return run


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    from illuminant_tpu.raster import tiled as T
    from illuminant_tpu.raster import sprites as S

    key = jax.random.key(7)
    kx, ky, kc, ks = jax.random.split(key, 4)

    def data(n):
        xs = jax.random.uniform(kx, (n,), jnp.float32, 0.0, W)
        ys = jax.random.uniform(ky, (n,), jnp.float32, 0.0, H)
        colors = jax.random.uniform(kc, (n, 4), jnp.float32,
                                    0.1, 0.9)
        # premultiplied
        colors = colors.at[:, :3].mul(colors[:, 3:4])
        size = jax.random.uniform(ks, (n,), jnp.float32, 2.0, 8.0)
        live = jnp.ones((n,), bool)
        return xs, ys, colors, size, live

    def cfg_for(k):
        return T.TiledRasterConfig(
            height=H, width=W, tile=32, bin_capacity=k, apron=4,
            kernel="gauss", channels=4, compact_payload=False,
        )

    if want("A1"):
        xs, ys, colors, size, live = data(1 << 18)
        for k in (64, 128, 256, 512):
            cfg = cfg_for(k)

            def body(eps, xs, ys, colors, size, live, cfg=cfg):
                img, _ = T.rasterize_tiled_alpha(
                    cfg, xs + eps, ys, colors, size, live)
                return img

            timed(f"A1 tiled_alpha 1080p N=256k K={k}", loop(body),
                  jnp.zeros((H, W, 4), jnp.float32),
                  xs, ys, colors, size, live)

    if want("A2"):
        yy, xx = np.mgrid[-7:8, -7:8].astype(np.float32)
        tex = np.clip(1.0 - np.sqrt(xx**2 + yy**2) / 7.0, 0, 1) ** 1.5
        table = S.build_sprite_table(tex, rank=3, size_bins=2,
                                     size_min=3.0, size_max=8.0)
        xs, ys, colors, size, live = data(1 << 18)
        for k in (64, 128, 256):
            cfg = cfg_for(k)

            def body(eps, xs, ys, colors, size, live, cfg=cfg):
                img, _ = S.rasterize_sprites_alpha(
                    cfg, table, xs + eps, ys, colors, size, live)
                return img

            timed(f"A2 sprites_alpha rank3 1080p N=256k K={k}",
                  loop(body), jnp.zeros((H, W, 4), jnp.float32),
                  xs, ys, colors, size, live)

    if want("A3"):
        for n in (1 << 14, 1 << 18):
            xs, ys, colors, size, live = data(n)
            cfg = cfg_for(128)

            def body(eps, xs, ys, colors, size, live, cfg=cfg):
                img, _ = T.rasterize_tiled_alpha(
                    cfg, xs + eps, ys, colors, size, live)
                return img

            timed(f"A3 tiled_alpha K=128 N={n >> 10}k (occupancy indep)",
                  loop(body), jnp.zeros((H, W, 4), jnp.float32),
                  xs, ys, colors, size, live)


if __name__ == "__main__":
    main()
