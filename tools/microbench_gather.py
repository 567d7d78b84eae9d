"""Map the TPU gather wall: which scattered-access shapes are fast?

Informs the voxel-field fast path (round 4). Hypotheses:
  - scalar taps (gather of single elements) are DESCRIPTOR-limited
    (~10 ns/tap measured on v5e via XLA gather) regardless of dtype
  - row gathers (slice_sizes=(1, W)) pay one descriptor per row ->
    same wall per ROW, but move W elements each
  - minor-axis take_along_axis (per-row lane select from an existing
    (N, W) array) may lower to a vectorized in-register gather -> VPU
    speed, no descriptors

Usage: python tools/microbench_gather.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20


def timeit(name, f, *a, reps=20):
    out = f(*a)
    jax.block_until_ready(out)
    float(jnp.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    float(jnp.asarray(out).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.3f} ms", flush=True)


def main():
    key = jax.random.key(0)
    M = 1 << 19  # table entries
    tbl = jax.random.uniform(key, (M,), jnp.float32)
    tbl2c = jax.random.uniform(key, (M, 2), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (N,), 0, M)

    print(f"# N={N} taps, table {M} entries, {jax.devices()[0]}")

    @jax.jit
    def scalar_f32(idx):
        return tbl[idx]

    @jax.jit
    def pair_f32(idx):
        return tbl2c[idx]  # slice (1, 2): 8B per descriptor

    timeit("scalar tap f32 (4B)   ", scalar_f32, idx)
    timeit("pair tap f32x2 (8B)   ", pair_f32, idx)

    # sorted indices: does coherence help?
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def scalar_sorted(idx):
        return tbl[idx]

    timeit("scalar tap f32 sorted ", scalar_sorted, idx_sorted)

    # row gather: (R, W) table, gather N rows
    W = 256
    R = 2048
    tbl2 = jax.random.uniform(key, (R, W), jnp.float32)
    ridx = jax.random.randint(jax.random.key(2), (N // 64,), 0, R)

    @jax.jit
    def row_gather(ridx):
        return tbl2[ridx]  # (N/64, W)

    timeit(f"row gather {N // 64}x{W}f32", row_gather, ridx)

    # minor-axis take_along_axis: per-row lane select
    arr = jax.random.uniform(key, (N // 4, W), jnp.float32)
    lidx = jax.random.randint(jax.random.key(3), (N // 4, 1), 0, W)

    @jax.jit
    def lane_select(arr, lidx):
        return jnp.take_along_axis(arr, lidx, axis=1)

    timeit(f"take_along_axis minor ({N // 4}x{W})", lane_select, arr, lidx)

    # one-hot matmul contraction for the same per-row select
    @jax.jit
    def onehot_select(arr, lidx):
        oh = (jnp.arange(W, dtype=jnp.int32)[None] == lidx
              ).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            arr.astype(jnp.bfloat16), oh,
            (((1,), (1,)), ((0,), (0,))))

    timeit(f"one-hot batched dot   ({N // 4}x{W})", onehot_select, arr,
           lidx)

    # sublane-axis take_along_axis: per-column select over 8-16 rows
    arr8 = jax.random.uniform(key, (16, N // 4), jnp.float32)
    sidx = jax.random.randint(jax.random.key(4), (1, N // 4), 0, 16)

    @jax.jit
    def sublane_select(arr8, sidx):
        return jnp.take_along_axis(arr8, sidx, axis=0)

    timeit(f"take_along_axis major (16x{N // 4})", sublane_select, arr8,
           sidx)


if __name__ == "__main__":
    main()
