"""Voxel-field frame cost breakdown (round 4): where do the gathers go?

The voxel flagship measured ~280 ms/frame at 540p (analytic: ~6 ms) —
this times each field-consuming stage with the SdfVolume vs the
AnalyticScene to locate the scatter-gather cost before optimizing.

Usage: python tools/profile_voxel.py [H W CAP]
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

H = int(sys.argv[1]) if len(sys.argv) > 1 else 540
W = int(sys.argv[2]) if len(sys.argv) > 2 else 960
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 18


def timeit(name, f, *a, reps=10):
    out = f(*a)
    jax.block_until_ready(out)
    # axon fence: small host transfer
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.lighting.sphere import accumulate_sphere_lights
    from illuminant_tpu.particles.integrate import (
        integrate_with_distance_field)
    from illuminant_tpu.lighting import scan_shadows as SS

    sv = build_flagship(height=H, width=W, capacity=CAP, field="voxel",
                        preset="fast")
    sa = build_flagship(height=H, width=W, capacity=CAP, preset="fast")
    q = sv.config.quality
    env_u = sv.environment.uniforms()
    su = sv.system.system_uniforms(1.0 / 60.0)
    rd = sv.system.render_data

    state = sv.system.state

    for tag, volume in (("voxel", sv.volume), ("analytic", sa.volume)):
        print(f"--- field = {tag}")

        @jax.jit
        def integ(state, volume=volume):
            return integrate_with_distance_field(
                state, su, rd, volume, substeps=1)

        timeit(f"  integrate({CAP // 1024}k, substeps=1)", integ, state)

        @jax.jit
        def lights(volume=volume):
            return accumulate_sphere_lights(
                volume, sv.gbuffer, sv.sphere_lights, env_u, q,
                shadow_mode="scan")

        timeit("  sphere lights (scan shadows + AO)", lights)

        @jax.jit
        def occl(volume=volume):
            return SS.occlusion_image(
                volume, int(H * q.shadow_scale), int(W * q.shadow_scale),
                jnp.float32(12.0), q.shadow_scale)

        try:
            timeit("  occlusion image", occl)
        except Exception as e:  # noqa: BLE001
            print(f"  occlusion image: skipped ({type(e).__name__})")

    # whole frames
    for tag, sc in (("voxel", sv), ("analytic", sa)):
        args = [jax.tree.map(jnp.copy, sc.system.state),
                jnp.asarray(0.5, jnp.float32), jax.random.key(0),
                sc.volume, sc.gbuffer, sc.sphere_lights, env_u,
                jnp.asarray(sc.spawner.spawn_max, jnp.int32),
                jnp.asarray(0, jnp.int32)]
        out = sc.frame_loop(*args, 8)
        float(jnp.max(out[0][::101, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        args2 = [jax.tree.map(jnp.copy, sc.system.state),
                 jnp.asarray(0.5, jnp.float32), jax.random.key(0),
                 sc.volume, sc.gbuffer, sc.sphere_lights, env_u,
                 jnp.asarray(sc.spawner.spawn_max, jnp.int32),
                 jnp.asarray(0, jnp.int32)]
        out = sc.frame_loop(*args2, 8)
        float(jnp.max(out[0][::101, 0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 8
        print(f"frame({tag}): {dt * 1e3:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
