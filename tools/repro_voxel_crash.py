"""Minimal repro of the round-4 voxel bench crash: 1080p voxel flagship,
a few frame_loop dispatches, printing progress so the faulting stage is
visible. Usage: python tools/repro_voxel_crash.py [H W CAP CHUNK]
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
CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 400


def main():
    from illuminant_tpu.scenes import build_flagship

    print(f"# device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    scene = build_flagship(height=H, width=W, capacity=CAP,
                           preset="fast", field="voxel")
    print(f"# build: {time.perf_counter() - t0:.1f}s", flush=True)
    state = scene.system.state
    key = jax.random.key(0)
    env_u = scene.environment.uniforms()
    avg_lum = jnp.asarray(0.5, jnp.float32)
    spawn_count = jnp.asarray(scene.spawner.spawn_max, jnp.int32)

    def run(state, avg_lum, i0, n):
        return scene.frame_loop(
            state, avg_lum, key, scene.volume, scene.gbuffer,
            scene.sphere_lights, env_u, spawn_count,
            jnp.asarray(i0, jnp.int32), n,
        )

    def fence(x):
        return float(jnp.max(x[::257, 0].astype(jnp.float32)))

    for c in range(4):
        t0 = time.perf_counter()
        img, state, avg_lum, drops = run(state, avg_lum, c * CHUNK, CHUNK)
        fence(img)
        dt = time.perf_counter() - t0
        print(f"# chunk {c}: {dt:.2f}s ({CHUNK / dt:.1f} fps)", flush=True)
    print("# OK", flush=True)


if __name__ == "__main__":
    main()
