"""Round-2 rasterizer design microbenchmarks.

Decides the 1M-particle binning strategy from measured primitive costs:
  G. scatter-add with sorted/unique hints + segment_sum (the
     "sort to pixel, reduce, place" design)
  H. searchsorted: per-tile start offsets from sorted keys
  I. vmapped dynamic_slice (contiguous row-block gather) bin build
  J. bf16 one-hot matmul splat at realistic tile counts
  K. full candidate pipeline: sort -> starts -> bins -> splat
  L. packed-operand sort (key + 4 int32)

Usage: python tools/microbench_raster2.py [name ...]
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
H, W = 1080, 1920
ITERS = 200


def fence(x):
    x = x.reshape(-1)
    return float(jnp.max(x[:: max(1, int(x.shape[0]) // 997 * 2 + 1)]))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt * 1e3:9.3f} ms/iter")
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
    HW = H * W

    if want("G"):
        idx_u = jnp.sort(jax.random.choice(key, HW, (N,), replace=False))
        idx_d = jnp.sort(jax.random.randint(key, (N,), 0, HW))
        vals = colors[:, 0]

        def scat1(img, indices, s, u):
            dn = lax.ScatterDimensionNumbers(
                update_window_dims=(), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,))
            return lax.scatter_add(img, indices[:, None], vals, dn,
                                   indices_are_sorted=s, unique_indices=u)

        for nm, ind, s, u in (
            ("G1 scatter 1M scalars sorted+unique", idx_u, True, True),
            ("G2 scatter 1M scalars sorted dup", idx_d, True, False),
            ("G3 scatter 1M scalars no hints", idx_d, False, False),
        ):
            def body(i, img, ind=ind, s=s, u=u):
                return scat1(img, ind, s, u)
            timed(nm, loop(body), jnp.zeros((HW,), jnp.float32))

        def body_ss(i, img):
            return img + jax.ops.segment_sum(
                colors, idx_d, num_segments=HW, indices_are_sorted=True)

        timed("G4 segment_sum sorted 1M rows -> 2M", loop(body_ss),
              jnp.zeros((HW, 4), jnp.float32))

    if want("H"):
        tile = (ys.astype(jnp.int32) // 32) * 60 + xs.astype(jnp.int32) // 32
        skeys = jnp.sort(tile)
        NT = (1080 // 32 + 1) * 60

        def body(i, c):
            return jnp.searchsorted(skeys, jnp.arange(NT) + i * 0)

        timed(f"H1 searchsorted {NT} tiles in 1M keys", loop(body),
              jnp.zeros((NT,), jnp.int32))

        def body2(i, c):
            # histogram of 1M keys into NT bins via one-hot matmul blocks
            oh = (tile[:, None] // 1 == jnp.arange(0, 256)[None, :] + i * 0)
            return c + jnp.sum(oh.astype(jnp.bfloat16), axis=0
                               ).astype(jnp.float32)

        timed("H2 one-hot count 1M x 256 bins bf16", loop(body2),
              jnp.zeros((256,), jnp.float32))

    if want("I"):
        data = jax.random.uniform(key, (N, 4), jnp.float32)
        NT, K = 2040, 1024
        starts = jnp.sort(jax.random.randint(key, (NT,), 0, N - K))

        def body(i, c):
            def get(s):
                return lax.dynamic_slice(data, (s + i * 0, 0), (K, 4))
            return jax.vmap(get)(starts)

        timed(f"I1 vmap dynamic_slice {NT}x{K} rows of 4", loop(body),
              jnp.zeros((NT, K, 4), jnp.float32))

        NT2, K2 = 8160, 256

        def body2(i, c):
            starts2 = jnp.sort(jax.random.randint(
                jax.random.key(3), (NT2,), 0, N - K2)) + i * 0

            def get(s):
                return lax.dynamic_slice(data, (s, 0), (K2, 4))
            return jax.vmap(get)(starts2)

        timed(f"I2 vmap dynamic_slice {NT2}x{K2} rows of 4", loop(body2),
              jnp.zeros((NT2, K2, 4), jnp.float32))

    if want("J"):
        # bf16 one-hot bilinear splat, 32x32 tiles, K=1024 (2040 tiles).
        TH = TW = 32
        NT, K = 2040, 1024
        px = jax.random.uniform(kx, (NT, K), jnp.float32, 0.0, TW)
        py = jax.random.uniform(ky, (NT, K), jnp.float32, 0.0, TH)
        pc = jax.random.uniform(kc, (NT, K, 4), jnp.float32)

        def splat(px, py, pc):
            ry = jnp.arange(TH, dtype=jnp.float32)[None, :, None]
            rx = jnp.arange(TW, dtype=jnp.float32)[None, None, :]
            wy = jnp.clip(1.0 - jnp.abs(ry - py[:, None, :]), 0.0, 1.0
                          ).astype(jnp.bfloat16)
            wx = jnp.clip(1.0 - jnp.abs(rx - px[:, :, None]), 0.0, 1.0)
            rhs = (wx[:, :, :, None] * pc[:, :, None, :]).reshape(
                NT, K, TW * 4).astype(jnp.bfloat16)
            return jnp.einsum("thk,tkw->thw", wy, rhs,
                              preferred_element_type=jnp.float32)

        def body(i, c, px, py, pc):
            return splat(px + i * 0, py, pc)

        timed(f"J1 splat {NT}x{K} bf16 32x32 tiles", loop(body),
              splat(px, py, pc), px, py, pc)

        TH2 = TW2 = 16
        NT2, K2 = 8160, 256
        px2 = jax.random.uniform(kx, (NT2, K2), jnp.float32, 0.0, TW2)
        py2 = jax.random.uniform(ky, (NT2, K2), jnp.float32, 0.0, TH2)
        pc2 = jax.random.uniform(kc, (NT2, K2, 4), jnp.float32)

        def splat2(px, py, pc):
            ry = jnp.arange(TH2, dtype=jnp.float32)[None, :, None]
            rx = jnp.arange(TW2, dtype=jnp.float32)[None, None, :]
            wy = jnp.clip(1.0 - jnp.abs(ry - py[:, None, :]), 0.0, 1.0
                          ).astype(jnp.bfloat16)
            wx = jnp.clip(1.0 - jnp.abs(rx - px[:, :, None]), 0.0, 1.0)
            rhs = (wx[:, :, :, None] * pc[:, :, None, :]).reshape(
                NT2, K2, TW2 * 4).astype(jnp.bfloat16)
            return jnp.einsum("thk,tkw->thw", wy, rhs,
                              preferred_element_type=jnp.float32)

        def body2(i, c, px, py, pc):
            return splat2(px + i * 0, py, pc)

        timed(f"J2 splat {NT2}x{K2} bf16 16x16 tiles", loop(body2),
              splat2(px2, py2, pc2), px2, py2, pc2)

    if want("L"):
        tile = (ys.astype(jnp.int32) // 32) * 60 + xs.astype(jnp.int32) // 32
        a = (xs * 16).astype(jnp.int32)
        b = (ys * 16).astype(jnp.int32)
        c1 = (colors[:, 0] * 65535).astype(jnp.int32)
        c2 = (colors[:, 1] * 65535).astype(jnp.int32)

        def body(i, carry):
            k, w, x, y, z = carry
            return lax.sort((k + i * 0, w, x, y, z), num_keys=1)

        timed("L1 sort 1M int32 key + 4 int32 ops", loop(body),
              (tile, a, b, c1, c2))

    if want("K"):
        # Full candidate: tile-sort -> searchsorted starts -> slice bins
        # -> bf16 splat. 32x32 tiles, K=1024.
        TH = TW = 32
        GX = (W + TW - 1) // TW  # 60
        GY = (H + TH - 1) // TH  # 34
        NT, K = GX * GY, 1024

        def pipeline(xs, ys, colors):
            txi = xs.astype(jnp.int32) // TW
            tyi = ys.astype(jnp.int32) // TH
            tid = tyi * GX + txi
            xf = (xs * 16.0).astype(jnp.int32)
            yf = (ys * 16.0).astype(jnp.int32)
            xy = xf << 16 | yf
            cb = colors.astype(jnp.bfloat16)
            c01 = lax.bitcast_convert_type(cb[:, 0:2], jnp.int32)
            c23 = lax.bitcast_convert_type(cb[:, 2:4], jnp.int32)
            k_s, xy_s, c01_s, c23_s = lax.sort(
                (tid, xy, c01, c23), num_keys=1)
            starts = jnp.searchsorted(k_s, jnp.arange(NT, dtype=jnp.int32))

            data = jnp.stack([xy_s, c01_s, c23_s], axis=1)  # (N, 3)

            def get(s):
                return lax.dynamic_slice(data, (s, 0), (K, 3))

            bins = jax.vmap(get)(jnp.minimum(starts, N - K))  # (NT, K, 3)
            ends = jnp.concatenate(
                [starts[1:], jnp.asarray([N], jnp.int32)])
            valid = (jnp.arange(K)[None, :]
                     < (ends - starts)[:, None])  # (NT, K)

            xy_b = bins[:, :, 0]
            px = (xy_b >> 16).astype(jnp.float32) / 16.0
            py = (xy_b & 0xFFFF).astype(jnp.float32) / 16.0
            tx0 = (jnp.arange(NT, dtype=jnp.int32) % GX * TW
                   ).astype(jnp.float32)
            ty0 = (jnp.arange(NT, dtype=jnp.int32) // GX * TH
                   ).astype(jnp.float32)
            px = px - tx0[:, None]
            py = py - ty0[:, None]
            cb01 = lax.bitcast_convert_type(
                bins[:, :, 1], jnp.bfloat16)  # (NT,K,2)
            cb23 = lax.bitcast_convert_type(bins[:, :, 2], jnp.bfloat16)
            pc = jnp.concatenate([cb01, cb23],
                                 axis=-1).astype(jnp.float32)
            pc = pc * valid[:, :, None]

            ry = jnp.arange(TH, dtype=jnp.float32)[None, :, None]
            rx = jnp.arange(TW, dtype=jnp.float32)[None, None, :]
            wy = jnp.clip(1.0 - jnp.abs(ry - py[:, None, :]), 0.0, 1.0
                          ).astype(jnp.bfloat16)
            wx = jnp.clip(1.0 - jnp.abs(rx - px[:, :, None]), 0.0, 1.0)
            rhs = (wx[:, :, :, None] * pc[:, :, None, :]).reshape(
                NT, K, TW * 4).astype(jnp.bfloat16)
            tiles = jnp.einsum("thk,tkw->thw", wy, rhs,
                               preferred_element_type=jnp.float32)
            img = tiles.reshape(GY, GX, TH, TW * 4).transpose(
                0, 2, 1, 3).reshape(GY * TH, GX * TW * 4)
            return img

        def body(i, c, xs, ys, colors):
            return pipeline(xs + i * 0.0, ys, colors)

        timed(f"K1 FULL pipeline sort+bin+splat {NT}x{K}", loop(body),
              pipeline(xs, ys, colors), xs, ys, colors)


if __name__ == "__main__":
    main()
