"""A/B: analytic scan refine 'carried' vs 'exact' on TPU (r5 regression).

BENCH_r04 (exact analytic refine) vs HEAD (analytic carried refine)
dropped every scan-heavy row 10-20%. This times scan_cone_visibility on
the flagship analytic scene at both parity and fast quality points, in
one process, to attribute the drop.

Usage: python tools/ab_carried_analytic.py
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

H, W = 1080, 1920


def timeit(name, f, *a, reps=30):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    import dataclasses

    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.lighting.scan_shadows import scan_cone_visibility

    sc = build_flagship(height=H, width=W, capacity=1 << 20,
                        preset="parity")
    lights = sc.sphere_lights
    ns = lights.position.shape[0]
    lifts = jnp.full((ns,), 1.6, jnp.float32)
    for label, q in (
        ("parity", sc.config.quality),
        ("fast", dataclasses.replace(
            sc.config.quality, shadow_scale=0.5,
            scan_nomination_scale=0.5)),
    ):
        for mode in ("carried", "exact"):
            qm = dataclasses.replace(q, scan_refine_mode=mode)

            fn = jax.jit(lambda pos, rad, ramp, qq=qm: scan_cone_visibility(
                sc.volume, sc.gbuffer, pos, rad, ramp, qq,
                self_occlusion_lift=lifts,
                light_active=lights.active,
            ))
            timeit(f"{label:6s} {mode:8s} scan 8-lane",
                   fn, lights.position, lights.properties[:, 0],
                   lights.properties[:, 1])


if __name__ == "__main__":
    main()
