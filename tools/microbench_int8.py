"""int8 MXU splat probe (queued round-3 idea; PERF.md).

The additive splat's einsums run bf16 x bf16 -> f32. If the axon v5e
backend lowers s8 x s8 -> s32 onto the MXU at 2x bf16 throughput, the
splat (and its rhs construction) could run int8. This measures exactly
the flagship splat shapes.

Usage: python tools/microbench_int8.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
except Exception:
    pass


def fence(x):
    return float(jnp.max(jnp.abs(x[::129].astype(jnp.float32))))


def bench(name, fn, a, b, iters=200):
    # Chain the carry through iterations so XLA cannot hoist the body
    # (axon-tpu measurement trap; see PERF.md methodology).
    @jax.jit
    def loop(a, b):
        def body(_, carry):
            out = fn(a + carry[:1, :1, :1].astype(a.dtype), b)
            return out
        init = fn(a, b)
        return jax.lax.fori_loop(0, iters, body, init)

    out = loop(a, b)
    fence(out.reshape(-1))
    t0 = time.perf_counter()
    out = loop(a, b)
    fence(out.reshape(-1))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.3f} ms")
    return dt


def main():
    # Flagship splat shapes: grid 34x60 = 2040 tiles, win 40, K 1016,
    # ch*win = 120.
    nt, win, k, v = 2040, 40, 1016, 120
    key = jax.random.key(0)
    wy_f = jax.random.uniform(key, (nt, win, k), jnp.float32)
    rhs_f = jax.random.uniform(jax.random.fold_in(key, 1), (nt, k, v),
                               jnp.float32)
    wy_bf = wy_f.astype(jnp.bfloat16)
    rhs_bf = rhs_f.astype(jnp.bfloat16)
    wy_i8 = (wy_f * 127).astype(jnp.int8)
    rhs_i8 = (rhs_f * 127).astype(jnp.int8)

    @jax.jit
    def splat_bf16(a, b):
        return jnp.einsum("twk,tkv->twv", a, b,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def splat_i8(a, b):
        return jnp.einsum("twk,tkv->twv", a, b,
                          preferred_element_type=jnp.int32)

    try:
        bench("bf16 splat", splat_bf16, wy_bf, rhs_bf)
    except Exception as e:  # noqa: BLE001
        print(f"bf16 splat FAILED: {e}")
    try:
        bench("int8 splat", splat_i8, wy_i8, rhs_i8)
    except Exception as e:  # noqa: BLE001
        print(f"int8 splat FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
