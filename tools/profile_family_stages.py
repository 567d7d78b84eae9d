"""Sub-stage attribution for the parity x full-family marginals (r5).

tune_parity_family.py put the extra-family cost at 9.57 ms (line +5.56,
directional +3.21, particle +1.58, volumetric +1.04, projector +0.45 on
top of the 16.86 ms parity base). Each family's marginal mixes (a) its
lane(s) in the fused multi-family scan (full-res at parity), (b) its
per-pixel illuminance math, and (c) blending/resize plumbing. This
times those pieces separately so the optimization hits the real one.

Usage: python tools/profile_family_stages.py
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


def fence(out):
    leaf = jnp.asarray(jax.tree.leaves(out)[0])
    return float(leaf.reshape(-1)[:3].astype(jnp.float32).sum())


def timeit(name, f, *a, reps=20):
    out = f(*a)
    fence(out)
    out = f(*a)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    fence(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.lighting.directional import (
        accumulate_directional_lights, directional_scan_args)
    from illuminant_tpu.lighting.line import (
        accumulate_line_lights, line_scan_anchors,
        compute_line_light_opacity)
    from illuminant_tpu.lighting.particle_light import (
        accumulate_particle_lights)
    from illuminant_tpu.lighting.scan_shadows import scan_cone_visibility

    sc = build_flagship(height=H, width=W, capacity=1 << 20,
                        preset="parity", full_family=True)
    q = sc.config.quality
    env_u = sc.environment.uniforms()
    gb = sc.gbuffer
    vol = sc.volume
    lights = sc.sphere_lights
    extra = sc.extra_lights

    # --- fused scan lane marginals (parity: full-res scan) ---
    ns = lights.position.shape[0]
    base_pos = lights.position
    base_rad = lights.properties[:, 0]
    base_ramp = lights.properties[:, 1]
    lifts = jnp.full((ns,), 1.6, jnp.float32)
    mtd = jnp.full((ns,), 1e8, jnp.float32)
    tz = jnp.sum(lights.position[:, 2] * lights.active) / jnp.maximum(
        jnp.sum(lights.active), 1.0) * 0.4

    scan = jax.jit(lambda pos, rad, ramp, lift, m: scan_cone_visibility(
        vol, gb, pos, rad, ramp, q, self_occlusion_lift=lift,
        max_trace_distance=m, trace_z=tz, upsample=False))

    timeit("scan 8 sphere lanes", scan, base_pos, base_rad, base_ramp,
           lifts, mtd)

    dcen, drad, dramp, dtrace, _ = directional_scan_args(
        gb, extra["directional"], env_u)
    pos9 = jnp.concatenate([base_pos, dcen], 0)
    rad9 = jnp.concatenate([base_rad, drad])
    ramp9 = jnp.concatenate([base_ramp, dramp])
    lift9 = jnp.concatenate([lifts, jnp.full((dcen.shape[0],), 1.5)])
    mtd9 = jnp.concatenate([mtd, dtrace])
    timeit("scan 9 (+directional)", scan, pos9, rad9, ramp9, lift9, mtd9)

    anchors, rad3, ramp3 = line_scan_anchors(extra["line"])
    pos12 = jnp.concatenate([pos9, anchors], 0)
    rad12 = jnp.concatenate([rad9, rad3])
    ramp12 = jnp.concatenate([ramp9, ramp3])
    lift12 = jnp.concatenate([lift9, jnp.full((rad3.shape[0],), 1.5)])
    mtd12 = jnp.concatenate([mtd9, jnp.full((rad3.shape[0],), 1e8)])
    vis12 = timeit("scan 12 (+dir+line)", scan, pos12, rad12, ramp12,
                   lift12, mtd12)
    del vis12
    vis_all = scan(pos12, rad12, ramp12, lift12, mtd12)

    # --- per-family elementwise accumulate with PRECOMPUTED vis ---
    nd = dcen.shape[0]
    dvis = vis_all[ns:ns + nd]
    lvis = vis_all[ns + nd:]

    acc_dir = jax.jit(lambda v: accumulate_directional_lights(
        vol, gb, extra["directional"], env_u, q,
        scan_visibility_precomputed=v, with_ao=False))
    timeit("dir accumulate (vis given)", acc_dir, dvis)

    acc_line = jax.jit(lambda v: accumulate_line_lights(
        vol, gb, extra["line"], env_u, q,
        scan_visibility_precomputed=v, with_ao=False))
    timeit("line accumulate (vis given)", acc_line, lvis)

    # line opacity math alone
    wp = gb.world_position()
    nrm = gb.normal
    ll = extra["line"]

    op = jax.jit(lambda: compute_line_light_opacity(
        wp[None], nrm[None], ll.start[:, None, None, :],
        ll.end[:, None, None, :], ll.properties[:, None, None, 0]))
    timeit("line opacity math", op)

    # particle lights (parity: lightmap res)
    st = sc.system.state
    acc_pl = jax.jit(lambda s: accumulate_particle_lights(
        vol, gb, s, extra["particle_light"], env_u, q,
        shadow_mode="scan"))
    timeit("particle lights", acc_pl, st)


if __name__ == "__main__":
    main()
