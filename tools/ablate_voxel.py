"""Voxel-frame stage ablation at 1080p (round 5, VERDICT task #1).

The stage profile (tools/profile_voxel.py) sums to ~260 ms but the
frame measures ~939 ms — this ablates stages INSIDE the real frame to
find where the rest goes: refine off, integrate against the analytic
scene, both.

Usage: python tools/ablate_voxel.py [H W CAP]
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

H = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20


def bench_scene(name, scene, chunk=8, reps=2):
    state = scene.system.state
    key = jax.random.key(0)
    env_u = scene.environment.uniforms()
    avg = jnp.asarray(0.5, jnp.float32)
    spawn = jnp.asarray(scene.spawner.spawn_max, jnp.int32)

    def go(st, av, i0):
        return scene.frame_loop(st, av, key, scene.volume, scene.gbuffer,
                                scene.sphere_lights, env_u, spawn,
                                jnp.asarray(i0, jnp.int32), chunk)

    def fence(x):
        return float(jnp.max(x[::257, 0].astype(jnp.float32)))

    img, state, avg, _ = go(state, avg, 0)
    fence(img)
    t0 = time.perf_counter()
    for r in range(reps):
        img, state, avg, _ = go(state, avg, (r + 1) * chunk)
    fence(img)
    ms = (time.perf_counter() - t0) / (reps * chunk) * 1e3
    print(f"{name}: {ms:.1f} ms/frame", flush=True)
    return ms


def main():
    from illuminant_tpu.core.config import QualitySettings
    from illuminant_tpu import scenes as SC

    print(f"# {W}x{H} cap={CAP} {jax.devices()[0]}", flush=True)

    q0 = QualitySettings(scan_refine_samples=0)

    sa = SC.build_flagship(height=H, width=W, capacity=CAP,
                           preset="fast")
    bench_scene("analytic full", sa)

    sv = SC.build_flagship(height=H, width=W, capacity=CAP,
                           preset="fast", field="voxel")
    bench_scene("voxel full", sv)

    sv2 = SC.build_flagship(height=H, width=W, capacity=CAP,
                            preset="fast", field="voxel", quality=q0)
    bench_scene("voxel refine=0", sv2)

    # Integrate against the analytic scene instead of the voxel field
    # (isolates the collision sampling cost in-frame).
    real = SC.integrate_with_distance_field
    try:
        def fake_integrate(state, su, rd, vol_t, substeps=1,
                           _sa=sa, _real=real):
            return _real(state, su, rd, _sa.volume, substeps=substeps)

        SC.integrate_with_distance_field = fake_integrate
        sv3 = SC.build_flagship(height=H, width=W, capacity=CAP,
                                preset="fast", field="voxel")
        bench_scene("voxel, integrate->analytic", sv3)

        sv4 = SC.build_flagship(height=H, width=W, capacity=CAP,
                                preset="fast", field="voxel", quality=q0)
        bench_scene("voxel, refine=0 + integrate->analytic", sv4)
    finally:
        SC.integrate_with_distance_field = real


if __name__ == "__main__":
    main()
