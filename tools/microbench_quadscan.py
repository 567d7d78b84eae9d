"""A/B the fused packed quad scan vs two bidirectional scans on TPU.

The quad scan (scan_shadows._quad_scan) fuses all 4 sector passes into
one lax.scan of max(H, W) steps with the three carry fields packed
along the light axis; the old path runs two W- and H-step scans.

Usage: python tools/microbench_quadscan.py
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

from illuminant_tpu.lighting import scan_shadows as ss  # noqa: E402

ITERS = 100


def fence(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.stack([jnp.sum(l[..., ::97].astype(jnp.float32))
                                    for l in leaves])))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt * 1e3:9.3f} ms/iter")
    return dt


def old_path(occ, lx, ly, lr):
    (e_d, e_k, e_n), (w_d, w_k, w_n) = ss._bidirectional_scan(
        occ, lx, ly, lr)
    (n_t, s_t) = ss._bidirectional_scan(occ.T, ly, lx, lr)
    return e_d, w_d, n_t[0], s_t[0], e_k, w_k, e_n, w_n, n_t[1], s_t[1]


def new_path(occ, lx, ly, lr):
    return ss._quad_scan(occ, lx, ly, lr)


def main():
    key = jax.random.PRNGKey(0)
    for (H, W) in [(540, 960), (1080, 1920)]:
        L = 8
        occ = jax.random.uniform(key, (H, W), jnp.float32) * 64.0
        lx = jax.random.uniform(key, (L,), jnp.float32) * W
        ly = jax.random.uniform(key, (L,), jnp.float32) * H
        lr = jnp.full((L,), 4.0, jnp.float32)
        print(f"--- {H}x{W} x {L} lights ---")
        timed("old: 2x bidirectional", jax.jit(old_path), occ, lx, ly, lr)
        timed("new: packed quad scan", jax.jit(new_path), occ, lx, ly, lr)


if __name__ == "__main__":
    main()
