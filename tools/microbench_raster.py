"""Microbenchmarks for particle-rasterizer design decisions (round 2).

Candidate designs for rasterizing 1M particles at 1080p:
  A. XLA scatter-add (img.at[y,x].add) — the naive path.
  B. Sort by tile id (multi-operand lax.sort) + per-tile MXU one-hot splat.
  C. Gather-based reorder (argsort + take).

This measures the raw primitives so the rasterizer is designed around the
hardware instead of hopes. Axon quirks handled: fence with a host transfer,
warm every op, batch ITERS reps inside one jitted fori_loop per measurement.

Usage: python tools/microbench_raster.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
H, W = 1080, 1920
ITERS = 20


def fence(x):
    x = x.reshape(-1)
    return float(jnp.max(x[::2571]))


def timed(name, fn, *args):
    out = fn(*args)  # compile + warm
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt * 1e3:9.3f} ms/iter")
    return dt


def loop(body):
    """Run body ITERS times inside one dispatch, threading the carry."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: body(i, c), x)

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

    # --- A. scatter-add -------------------------------------------------
    if want("scatter"):
        xi = xs.astype(jnp.int32)
        yi = ys.astype(jnp.int32)

        def body(i, img):
            return img.at[yi, xi].add(colors)

        timed("A  scatter-add 1M rows (H,W,4)", loop(body),
              jnp.zeros((H, W, 4), jnp.float32))

        flat = yi * W + xi

        def body1(i, img):
            return img.at[flat].add(colors[:, 0])

        timed("A2 scatter-add 1M scalars (H*W,)", loop(body1),
              jnp.zeros((H * W,), jnp.float32))

    # --- B. multi-operand sort ------------------------------------------
    if want("sort"):
        tile = (ys.astype(jnp.int32) // 128) * 15 + xs.astype(jnp.int32) // 128

        def body(i, carry):
            k, a, b, c, d = carry
            out = jax.lax.sort((k + i * 0, a, b, c, d), num_keys=1)
            return out

        timed("B  sort 1M int32 key + 4 f32 ops", loop(body),
              (tile, xs, ys, colors[:, 0], colors[:, 1]))

        def body_k(i, k):
            return jax.lax.sort((k + i * 0,), num_keys=1)[0]

        timed("B2 sort 1M int32 key only", loop(body_k), tile)

        def body_seg(i, k):
            # boundary detection + cumsum (rank-within-segment machinery)
            ksh = jnp.roll(k, 1)
            boundary = (k != ksh).astype(jnp.int32)
            seg_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(boundary == 1,
                                       jnp.arange(N, dtype=jnp.int32), 0))
            return k + seg_start * 0

        timed("B3 segment-start scan over 1M", loop(body_seg), tile)

    # --- C. gather reorder ----------------------------------------------
    if want("gather"):
        perm = jax.random.permutation(key, N)

        def body(i, c):
            return jnp.take(c, perm, axis=0)

        timed("C  gather 1M rows of (N,4)", loop(body), colors)

        def body_s(i, c):
            return jnp.take(c, perm)

        timed("C2 gather 1M scalars", loop(body_s), colors[:, 0])

    # --- D. tile one-hot matmul splat -----------------------------------
    # Splat K particles into a (TH, TW) tile: two one-hot matmuls.
    if want("matmul"):
        TH, TW, K = 128, 128, 512
        NT = (H // TH) * (W // TW) * 0 + 135  # ~tiles at 1080p with 128x128
        px = jax.random.uniform(kx, (NT, K), jnp.float32, 0.0, TW)
        py = jax.random.uniform(ky, (NT, K), jnp.float32, 0.0, TH)
        pc = jax.random.uniform(kc, (NT, K, 4), jnp.float32)

        def splat(px, py, pc):
            # rows: (NT, TH, K) one-hot-ish (bilinear 2-tap)
            ry = jnp.arange(TH, dtype=jnp.float32)[None, :, None]
            rx = jnp.arange(TW, dtype=jnp.float32)[None, None, :]
            wy = jnp.clip(1.0 - jnp.abs(ry - py[:, None, :]), 0.0, 1.0)
            # (NT, K, TW)
            wx = jnp.clip(1.0 - jnp.abs(rx - px[:, :, None]), 0.0, 1.0)
            # (NT, TH, K) @ (NT, K, TW*4)
            rhs = (wx[:, :, :, None] * pc[:, :, None, :]).reshape(
                NT, K, TW * 4)
            tiles = jnp.einsum("thk,tkw->thw", wy, rhs,
                               preferred_element_type=jnp.float32)
            return tiles

        def body(i, carry):
            return splat(px + i * 0, py, pc)

        timed(f"D  {NT} tiles x {K} particles bilinear matmul splat",
              loop(body), splat(px, py, pc))

    # --- E. current frame breakdown helpers ------------------------------
    if want("hist"):
        img = jax.random.uniform(key, (H, W, 4), jnp.float32)

        def body(i, img):
            lum = (img[..., 0] * 0.299 + img[..., 1] * 0.587
                   + img[..., 2] * 0.114)
            lg = jnp.log2(jnp.maximum(lum, 1e-6))
            idx = jnp.clip((lg + 10.0) * 3.2, 0, 63).astype(jnp.int32)
            hist = jnp.zeros((64,), jnp.int32).at[idx.reshape(-1)].add(1)
            return img + hist[0] * 1e-20

        timed("E  64-bucket histogram over 1080p", loop(body), img)

        def body2(i, img):
            lum = (img[..., 0] * 0.299 + img[..., 1] * 0.587
                   + img[..., 2] * 0.114)
            lg = jnp.log2(jnp.maximum(lum, 1e-6))
            idx = jnp.clip((lg + 10.0) * 3.2, 0, 63).astype(jnp.int32)
            onehot = idx[..., None] == jnp.arange(64, dtype=jnp.int32)
            hist = jnp.sum(onehot, axis=(0, 1))
            return img + hist[0] * 1e-20

        timed("E2 histogram via one-hot reduce", loop(body2), img)

    if want("tonemap"):
        img = jax.random.uniform(key, (H, W, 4), jnp.float32)

        def body(i, img):
            x = img * (1.0 + i * 0.0)
            a = 0.15
            num = x * (a * x + 0.05) + 0.004
            den = x * (a * x + 0.5) + 0.06
            t = num / den - 0.0666
            return jnp.clip(t, 0.0, 1.0) ** (1 / 2.2)

        timed("F  uncharted2+gamma tonemap 1080p", loop(body), img)


if __name__ == "__main__":
    main()


def sorted_scatter_bench():
    """Does XLA TPU scatter/gather get fast with sorted/unique hints?"""
    key = jax.random.key(7)
    HW = H * W
    # 1M sorted unique indices into 2M pixels.
    idx = jnp.sort(jax.random.choice(key, HW, (N,), replace=False))
    idx_dup = jnp.sort(jax.random.randint(key, (N,), 0, HW))
    vals = jax.random.uniform(key, (N, 4), jnp.float32)

    from jax import lax

    def scat(img, indices, sorted_, unique):
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        return lax.scatter_add(
            img, indices[:, None], vals, dnums,
            indices_are_sorted=sorted_, unique_indices=unique)

    for name, indices, s, u in (
        ("scatter-add sorted+unique hints", idx, True, True),
        ("scatter-add sorted dup hints", idx_dup, True, False),
        ("scatter-add no hints", idx_dup, False, False),
    ):
        def body(i, img, indices=indices, s=s, u=u):
            return scat(img, indices, s, u)
        timed(f"G  {name}", loop(body), jnp.zeros((HW, 4), jnp.float32))

    # monotonic gather: 2M gathers from 1M rows, indices sorted.
    gidx = jnp.sort(jax.random.randint(key, (HW,), 0, N))

    def gat(out_seed, indices, sorted_):
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return lax.gather(vals, indices[:, None], dnums, (1, 4),
                          indices_are_sorted=sorted_)

    for name, s in (("gather 2M rows sorted hint", True),
                    ("gather 2M rows no hint", False)):
        def body(i, seed, s=s):
            return gat(seed, gidx, s)[: 8] + seed
        timed(f"G2 {name}", loop(body), jnp.zeros((8, 4), jnp.float32))

    # segment_sum with sorted ids

    def body_ss(i, img):
        return img + jax.ops.segment_sum(
            vals, idx_dup, num_segments=HW, indices_are_sorted=True)

    timed("G3 segment_sum sorted 1M->2M", loop(body_ss),
          jnp.zeros((HW, 4), jnp.float32))


if __name__ == "__main__" and "sorted" in sys.argv:
    sorted_scatter_bench()
