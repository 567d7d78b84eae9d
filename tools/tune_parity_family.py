"""Parity x full-family cost attribution on the real chip (round 5).

The round-4 bench recorded parity_full_family at 37.7 fps (26.5 ms) vs
parity-sphere-only 59.7 fps (16.8 ms) — ~9.8 ms of extra-family cost at
lightmap resolution. This times each family's marginal at the PARITY
quality point (extra_family_scale 1.0, shadow_scale 1.0, nomination
0.25, substeps 3, round kernel) so the optimization targets the biggest
stage first (VERDICT r4 task #2).

Usage: python tools/tune_parity_family.py [frames]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from illuminant_tpu.scenes import build_flagship  # noqa: E402


def fence(x):
    return float(jnp.max(x[::257, 0].astype(jnp.float32)))


def run(name, frames=200, **kw):
    scene = build_flagship(height=1080, width=1920, capacity=1 << 20,
                           preset="parity", **kw)
    state = scene.system.state
    key = jax.random.key(0)
    env_u = scene.environment.uniforms()
    avg = jnp.asarray(0.5, jnp.float32)
    spawn = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
    chunk = frames

    def go(st, av, i0):
        return scene.frame_loop(st, av, key, scene.volume, scene.gbuffer,
                                scene.sphere_lights, env_u, spawn,
                                jnp.asarray(i0, jnp.int32), chunk)

    img, state, avg, drops = go(state, avg, 0)
    fence(img)
    img, state, avg, drops = go(state, avg, chunk)
    fence(img)
    t0 = time.perf_counter()
    img, state, avg, drops = go(state, avg, 2 * chunk)
    fence(img)
    dt = time.perf_counter() - t0
    fps = chunk / dt
    print(json.dumps({"variant": name, "fps": round(fps, 2),
                      "ms_per_frame": round(1000.0 / fps, 2),
                      "drops": int(drops)}), flush=True)
    return 1000.0 / fps


def main():
    args = [a for a in sys.argv[1:] if a != "quick"]
    quick = "quick" in sys.argv[1:]
    frames = int(args[0]) if args else 200
    base = run("parity_sphere_only", frames)
    full = run("parity_full_family", frames, full_family=True)
    print(f"# extra families total: {full - base:.2f} ms", flush=True)
    if quick:
        return
    for fam in ("directional", "line", "volumetric", "projector",
                "particle"):
        ms = run(f"parity_only_{fam}", frames, full_family=(fam,))
        print(f"# {fam}: +{ms - base:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
