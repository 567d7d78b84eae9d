"""Round-5 Pallas re-probe (VERDICT r4 task #6) + fused map-sampler
microbench.

Round-3 status: trivial kernels compiled; any dynamic load (pl.dslice
with a runtime index) crashed the remote Mosaic compiler (HTTP 500).
The columns_pallas kernel needs NO dynamic loads (one-hot rows are
iota compares; all slices static) — this probes whether it compiles,
validates it against the XLA two-stage, and times both at collision
scale (1M points, flagship 1080p coarse maps 135x240).

Usage: python tools/probe_pallas_r5.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from illuminant_tpu.lighting.environment import (
        LightingEnvironment, LightObstruction)
    from illuminant_tpu.sdf import volume as vol
    from illuminant_tpu.sdf import columns as C
    from illuminant_tpu.sdf import columns_pallas as CP

    print(f"# device: {jax.devices()[0]}", flush=True)
    ok = CP.available()
    print(f"pallas_available: {ok}", flush=True)

    env = LightingEnvironment(maximum_z=64.0)
    env.obstructions.append(LightObstruction.box(
        (600.0, 400.0, 16.0), (180.0, 120.0, 16.0)))
    env.obstructions.append(LightObstruction.cylinder(
        (1300.0, 700.0, 20.0), (100.0, 100.0, 20.0)))
    cfg = vol.SdfVolumeConfig(
        virtual_width=1920, virtual_height=1080, virtual_depth=64.0,
        resolution_scale=0.25, slice_count=16)
    volume = vol.generate_volume(cfg, env.pack_obstructions())
    cf = C.build_column_maps(volume)
    print(f"maps_c: {cf.maps_c.shape}", flush=True)

    n = 1 << 20
    key = jax.random.key(0)
    ks = jax.random.split(key, 3)
    pos = jnp.stack([
        jax.random.uniform(ks[0], (n,), minval=0.0, maxval=1920.0),
        jax.random.uniform(ks[1], (n,), minval=0.0, maxval=1080.0),
        jax.random.uniform(ks[2], (n,), minval=0.0, maxval=64.0),
    ], axis=-1)

    def timeit(name, f, reps=20):
        out = f()
        jax.block_until_ready(out)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        jax.block_until_ready(out)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:.2f} ms ({dt / n * 1e9:.2f} ns/pt)",
              flush=True)
        return out

    for grad in (False, True):
        tag = "grad" if grad else "d"

        @jax.jit
        def xla(pos=pos, grad=grad):
            packed = C._packed_maps(cf)
            pad = (-n) % C._MAP_CHUNK
            p = jnp.pad(pos, ((0, pad), (0, 0))).reshape(
                -1, C._MAP_CHUNK, 3)
            return jax.lax.map(
                lambda q: C._map_core(cf, packed, q, grad), p)

        o_x = timeit(f"xla two-stage [{tag}]", xla)
        if ok:
            @jax.jit
            def pal(pos=pos, grad=grad):
                return C._sample_pallas(cf, pos, grad)

            o_p = timeit(f"pallas fused  [{tag}]", pal)
            a = np.asarray(jax.tree.leaves(o_x)[0]).reshape(-1)[:n]
            b = np.asarray(jax.tree.leaves(o_p)[0]).reshape(-1)[:n]
            err = np.abs(a - b)
            print(f"  agree [{tag}]: mean {err.mean():.5f} "
                  f"max {err.max():.4f}", flush=True)


if __name__ == "__main__":
    main()
