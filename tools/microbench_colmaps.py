"""Column-map sampler shoot-out at collision scale (round 5).

The voxel-frame ablation (tools/ablate_voxel.py) pins ~36 ms of the
51 ms voxel frame on integrate's three 1M-point ColumnField samples.
This times sample_columns / sample_columns_grad at 1M on the REAL
flagship map shapes, Pallas kernel vs XLA two-stage, carry-chained so
dispatch overhead amortizes.

Usage: python tools/microbench_colmaps.py [N]
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


def timeit(name, f, x0, reps=30):
    @jax.jit
    def loop(x):
        # Carry-chain: feed a position-dependent perturbation back in so
        # successive calls can't be CSE'd or overlapped unrealistically.
        d = f(x)
        d0 = d[0] if isinstance(d, tuple) else d
        return x + (d0[:, None] * 1e-6) % 1.0

    x = loop(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = loop(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.3f} ms  ({dt / N * 1e9:.1f} ns/pt)",
          flush=True)


def main():
    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.sdf import columns as C
    from illuminant_tpu.sdf import columns_pallas as CP

    sv = build_flagship(height=1080, width=1920, capacity=1 << 14,
                        field="voxel", preset="fast")
    # The frame samples the ColumnField built from the combined volume;
    # build one directly from the static partition (same shapes).
    cf = C.build_column_maps(sv.volume)
    print(f"# maps_c {cf.maps_c.shape}  volume {cf.volume.data.shape}  "
          f"{jax.devices()[0]}", flush=True)

    k = jax.random.key(0)
    pos = jax.random.uniform(
        k, (N, 3), jnp.float32) * jnp.asarray([1920.0, 1080.0, 48.0])

    print(f"# pallas available: {CP.available()}", flush=True)
    timeit("sample_columns (auto)", lambda p: C.sample_columns(cf, p),
           pos)
    timeit("sample_columns_grad (auto)",
           lambda p: C.sample_columns_grad(cf, p), pos)

    # Force the XLA two-stage path.
    saved = CP._AVAILABLE
    CP._AVAILABLE = False
    try:
        timeit("sample_columns (xla two-stage)",
               lambda p: C.sample_columns(cf, p), pos)
        timeit("sample_columns_grad (xla two-stage)",
               lambda p: C.sample_columns_grad(cf, p), pos)
    finally:
        CP._AVAILABLE = saved


if __name__ == "__main__":
    main()
