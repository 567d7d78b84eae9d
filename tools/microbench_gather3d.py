"""Round-5 probe: 3D slab gathers for trilinear sampling.

microbench_gather.py established the ~10 ns/descriptor wall and that
wider slices amortize it (pair tap 7.8 ns moving 2 elements). This asks
the decisive question for the voxel fast path: what does ONE descriptor
per point cost when it moves the whole (2,2,2) trilinear neighborhood —
and the (1,2,2)-per-z / (2,2) bilinear variants.

Usage: python tools/microbench_gather3d.py [N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20


def timeit(name, f, *a, reps=20):
    out = f(*a)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.3f} ms  ({dt / N * 1e9:.2f} ns/pt)",
          flush=True)


def main():
    S, H, W = 16, 272, 480  # ~1080p flagship voxel volume
    key = jax.random.key(0)
    vol = jax.random.uniform(key, (S, H, W), jnp.float32)
    si = jax.random.randint(jax.random.key(1), (N,), 0, S - 1)
    yi = jax.random.randint(jax.random.key(2), (N,), 0, H - 1)
    xi = jax.random.randint(jax.random.key(3), (N,), 0, W - 1)
    print(f"# N={N} pts, volume {S}x{H}x{W} f32, {jax.devices()[0]}")

    # 8 scalar taps (the oracle's cost)
    @jax.jit
    def taps8(si, yi, xi):
        acc = 0.0
        for ds in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    acc = acc + vol[si + ds, yi + dy, xi + dx]
        return acc

    timeit("8 scalar taps       ", taps8, si, yi, xi)

    # ONE (2,2,2) slab gather per point via lax.gather
    def slab_gather(vol, si, yi, xi, sizes):
        idx = jnp.stack([si, yi, xi], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        return jax.lax.gather(
            vol, idx, dn, slice_sizes=sizes,
            mode=jax.lax.GatherScatterMode.CLIP)

    @jax.jit
    def slab222(si, yi, xi):
        return slab_gather(vol, si, yi, xi, (2, 2, 2))

    timeit("(2,2,2) slab gather ", slab222, si, yi, xi)

    @jax.jit
    def slab122(si, yi, xi):
        a = slab_gather(vol, si, yi, xi, (1, 2, 2))
        b = slab_gather(vol, si + 1, yi, xi, (1, 2, 2))
        return a + b

    timeit("2x (1,2,2) slabs    ", slab122, si, yi, xi)

    # (2,2,2) slab + full trilinear lerp fused
    wts = jax.random.uniform(jax.random.key(4), (N, 3), jnp.float32)

    @jax.jit
    def trilerp(si, yi, xi, wts):
        g = slab_gather(vol, si, yi, xi, (2, 2, 2))  # (N,2,2,2)
        ws, wy, wx = wts[:, 0], wts[:, 1], wts[:, 2]
        a = g[:, :, :, 0] + (g[:, :, :, 1] - g[:, :, :, 0]) * wx[:, None, None]
        b = a[:, :, 0] + (a[:, :, 1] - a[:, :, 0]) * wy[:, None]
        return b[:, 0] + (b[:, 1] - b[:, 0]) * ws

    timeit("slab + trilerp      ", trilerp, si, yi, xi, wts)

    # wider x slab: (2,2,8) — does moving 32B/descr change the wall?
    @jax.jit
    def slab228(si, yi, xi):
        return slab_gather(vol, si, yi, xi, (2, 2, 8))

    timeit("(2,2,8) slab gather ", slab228, si, yi, xi)

    # flattened-volume pair gather: pack (x,x+1) pairs, 4 descriptors
    vol_flat = vol.reshape(-1)

    @jax.jit
    def pairs4(si, yi, xi):
        base = (si * H + yi) * W + xi
        idx = jnp.stack([base, base + W, base + H * W,
                         base + H * W + W], axis=-1)  # (N, 4)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(),
            start_index_map=(0,))
        return jax.lax.gather(
            vol_flat, idx[..., None], dn, slice_sizes=(2,),
            mode=jax.lax.GatherScatterMode.CLIP)

    timeit("4x flat pair gather ", pairs4, si, yi, xi)


if __name__ == "__main__":
    main()
