"""Histogram reduction variants at 1080p x 3ch."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, B = 1080, 1920, 64
ITERS = 200
k = jax.random.key(0)
hdr0 = jax.random.uniform(k, (H, W, 3), jnp.float32, 0.0, 8.0)
scale = B / float(np.log1p(64.0))


def bench(name, f):
    @jax.jit
    def loop(hdr):
        def body(i, c):
            h, acc = c
            counts = f(h)
            return (h + acc * 1e-30, acc + counts[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, 10, body, (hdr, jnp.zeros(())))
    o = loop(hdr0); float(o[1])
    t0 = time.perf_counter()
    for _ in range(ITERS // 10):
        o = loop(o[0])
    float(o[1])
    dt = (time.perf_counter() - t0) / ITERS * 1e3 - 30.0 / ITERS
    print(f"{name:46s} {dt:7.3f} ms")


def idx_of(h):
    lum = (0.299 * h[..., 0] + 0.587 * h[..., 1] + 0.114 * h[..., 2]
           ).reshape(-1)
    u = jnp.log1p(jnp.maximum(lum, 0.0)) * scale
    return jnp.clip(jnp.floor(u).astype(jnp.int32), 0, B - 1)

def cur(h):
    idx = idx_of(h)
    oh = idx[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]
    return jnp.sum(oh.astype(jnp.bfloat16), axis=0, dtype=jnp.float32)

def matmul(h):
    idx = idx_of(h)
    oh = (idx[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)
    ones = jnp.ones((idx.shape[0],), jnp.bfloat16)
    return jax.lax.dot_general(ones, oh, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

def hier(h):
    idx = idx_of(h).reshape(-1, 1024)  # (2025, 1024)
    oh = (idx[..., None] == jnp.arange(B, dtype=jnp.int32)
          ).astype(jnp.bfloat16)
    part = jnp.sum(oh, axis=1, dtype=jnp.float32)  # (2025, B)
    return jnp.sum(part, axis=0)

def hier_mm(h):
    idx = idx_of(h).reshape(-1, 2048)  # (1012.5?) use 1013x2048? must divide
    return None

def col8(h):
    # count via 8 shifted compares summed as f32 directly (no one-hot mat)
    idx = idx_of(h)
    # reshape to (N/512, 512) then one_hot sum within rows
    idx2 = idx.reshape(-1, 512)
    oh = (idx2[..., None] == jnp.arange(B, dtype=jnp.int32))
    part = jnp.sum(oh, axis=1)  # int32 (rows, B)
    return jnp.sum(part, axis=0)

bench("current: bf16 one-hot sum axis0", cur)
bench("dot_general ones x one-hot", matmul)
bench("hierarchical reshape 1024 + two sums", hier)
bench("int32 one-hot rows of 512", col8)

from illuminant_tpu.utils.histogram import (bucket_boundaries,
                                            compute_histogram, percentile)
bounds = jnp.asarray(bucket_boundaries(max_value=64.0))

def lib_full(h):
    r = compute_histogram(h, bounds)
    return r.counts.astype(jnp.float32)

def lib_plus_pct(h):
    r = compute_histogram(h, bounds)
    return percentile(r, 95.0)[None]

def stats_only(h):
    lum = (0.299 * h[..., 0] + 0.587 * h[..., 1] + 0.114 * h[..., 2]
           ).reshape(-1)
    return jnp.stack([jnp.min(lum), jnp.max(lum), jnp.sum(lum)])

bench("lib compute_histogram (counts+stats)", lib_full)
bench("lib compute_histogram + percentile", lib_plus_pct)
bench("min/max/sum stats only", stats_only)
