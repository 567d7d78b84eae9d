"""Per-stage cost breakdown of the parity x full-family frame (r5).

tune_parity_family.py attributes per-FAMILY marginals (line +5.9 ms,
directional +3.7, particle +1.6, volumetric +1.1, projector +0.4 on a
16.76 ms sphere-only parity frame); this decomposes each marginal into
its stages — extra scan lanes vs per-family falloff math — so the
optimization targets the real cost (VERDICT r4 task #2).

Usage: python tools/profile_parity_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from illuminant_tpu.scenes import build_flagship  # noqa: E402


def timeit(name, f, *a, reps=20):
    f_j = jax.jit(f)
    out = jax.block_until_ready(f_j(*a))
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f_j(*a)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    sc = build_flagship(height=1080, width=1920, capacity=1 << 20,
                        preset="parity", full_family=True)
    q = sc.config.quality
    env_u = sc.environment.uniforms()
    gb = sc.gbuffer
    lights = sc.sphere_lights
    vol = sc.volume
    state = sc.system.state

    from illuminant_tpu.lighting.scan_shadows import (
        occlusion_image, scan_cone_visibility)
    from illuminant_tpu.lighting.sphere import accumulate_sphere_lights
    from illuminant_tpu.lighting.line import (
        LineLightSource, accumulate_line_lights, line_scan_anchors,
        pack_line_lights)
    from illuminant_tpu.lighting.directional import (
        DirectionalLightSource, accumulate_directional_lights,
        pack_directional_lights)
    from illuminant_tpu.lighting.particle_light import (
        ParticleLightSource, accumulate_particle_lights)
    from illuminant_tpu.lighting.environment import SphereLightSource

    h, w = gb.shape
    cx, cy = w * 0.5, h * 0.5
    ring = min(w, h) * 0.38

    # trace plane used by the frame
    trace_z = jnp.sum(lights.position[:, 2] * lights.active) / jnp.maximum(
        jnp.sum(lights.active), 1.0) * 0.4

    # 8-lane scan (sphere only)
    def scan8(vol_, gb_):
        return scan_cone_visibility(
            vol_, gb_, lights.position, lights.properties[:, 0],
            lights.properties[:, 1], q,
            self_occlusion_lift=jnp.full((8,), 1.6, jnp.float32),
            max_trace_distance=jnp.full((8,), 1e8, jnp.float32),
            trace_z=trace_z, upsample=False)

    # 12-lane fused scan (sphere + dir pseudo-center + 3 line anchors)
    sun = DirectionalLightSource(direction=(0.35, 0.55, -0.76),
                                 color=(0.35, 0.33, 0.28, 1.0))
    dirs = pack_directional_lights([sun])
    line = LineLightSource(
        start=(cx - ring * 0.9, cy - ring * 0.75, 44.0),
        end=(cx + ring * 0.9, cy - ring * 0.75, 44.0), radius=6.0,
        color_start=(0.9, 0.2, 0.2, 0.9), color_end=(0.2, 0.3, 0.9, 0.9))
    lls = pack_line_lights([line])

    def scan12(vol_, gb_):
        from illuminant_tpu.lighting.directional import (
            directional_scan_args)

        dcen, drad, dramp, dtrace, _ = directional_scan_args(
            gb_, dirs, env_u)
        anchors, rad3, ramp3 = line_scan_anchors(lls)
        pos = jnp.concatenate([lights.position, dcen, anchors], 0)
        rad = jnp.concatenate([lights.properties[:, 0], drad, rad3])
        ramp = jnp.concatenate([lights.properties[:, 1], dramp, ramp3])
        lift = jnp.concatenate([jnp.full((8,), 1.6), jnp.full((1,), 1.5),
                                jnp.full((3,), 1.5)]).astype(jnp.float32)
        mtd = jnp.concatenate([jnp.full((8,), 1e8), dtrace,
                               jnp.full((3,), 1e8)]).astype(jnp.float32)
        return scan_cone_visibility(
            vol_, gb_, pos, rad, ramp, q, self_occlusion_lift=lift,
            max_trace_distance=mtd, trace_z=trace_z, upsample=False)

    t8 = timeit("scan 8 lanes (sphere only)", scan8, vol, gb)
    t12 = timeit("scan 12 lanes (fused full family)", scan12, vol, gb)
    print(f"#   marginal per extra lane: {(t12 - t8) / 4:.2f} ms")

    vis8 = jax.jit(scan8)(vol, gb)
    vis12 = jax.jit(scan12)(vol, gb)

    timeit("occlusion_image (nomination grid)",
           lambda v: occlusion_image(v, 270, 480, trace_z, 0.25,
                                     jnp.zeros((2,), jnp.float32)), vol)

    timeit("sphere falloff (precomputed vis)",
           lambda v, g, vv: accumulate_sphere_lights(
               v, g, lights, env_u, q, with_specular=False,
               shadow_mode="scan", with_ao=False, with_alpha=False,
               scan_visibility_precomputed=vv), vol, gb, vis8)

    timeit("line falloff (precomputed vis)",
           lambda v, g, vv: accumulate_line_lights(
               v, g, lls, env_u, q, shadow_mode="scan",
               scan_visibility_precomputed=vv, with_ao=False),
           vol, gb, vis12[9:12])

    timeit("directional falloff (precomputed vis)",
           lambda v, g, vv: accumulate_directional_lights(
               v, g, dirs, env_u, q, shadow_mode="scan",
               scan_visibility_precomputed=vv, with_ao=False),
           vol, gb, vis12[8:9])

    plight = ParticleLightSource(
        template=SphereLightSource(
            position=(0.0, 0.0, 0.0), radius=3.0, ramp_length=90.0,
            color=(1.0, 1.0, 1.0, 0.035), cast_shadows=False),
        max_lights=32)
    timeit("particle lights (32, tiled)",
           lambda v, g, st: accumulate_particle_lights(
               v, g, st, plight, env_u, q, shadow_mode="scan"),
           vol, gb, state)


if __name__ == "__main__":
    main()
