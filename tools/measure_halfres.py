"""Measure the half-res extra-family lever's error (ADVICE r4 / VERDICT #4).

For each extra light family, renders the SAME flagship frame (identical
particle state, matched exposure) with quality.extra_family_scale 0.5 vs
1.0 and reports the uint8-output error in LSB. The bound this measures is
pinned by tests/test_advice_r4.py.

Usage: python tools/measure_halfres.py [height width]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

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

from illuminant_tpu.core.config import QualitySettings  # noqa: E402
from illuminant_tpu.scenes import build_flagship  # noqa: E402


def one_frame(scene, frame_index):
    state = scene.system.state
    key = jax.random.key(0)
    env_u = scene.environment.uniforms()
    avg = jnp.asarray(0.5, jnp.float32)
    spawn = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
    # Advance particle state deterministically for a few frames so the
    # particle-light family has live particles to read, then measure.
    img = None
    for i in range(frame_index + 1):
        img, state, _avg_out, _ = scene.frame(
            state, avg, key, scene.volume, scene.gbuffer,
            scene.sphere_lights, env_u, spawn, frame_index=i)
        # Keep avg FIXED so both runs use identical exposure.
    return np.asarray(img)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 540
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    fams = ["directional", "line", "volumetric", "projector", "particle",
            "all"]
    for fam in fams:
        ff = True if fam == "all" else (fam,)
        imgs = {}
        for scale in (0.5, 1.0):
            q = QualitySettings(extra_family_scale=scale)
            scene = build_flagship(height=h, width=w, capacity=1 << 16,
                                   spawn_max=1024, full_family=ff,
                                   quality=q)
            imgs[scale] = one_frame(scene, 6)
        d = np.abs(imgs[0.5].astype(np.int32) - imgs[1.0].astype(np.int32))
        print(json.dumps({
            "family": fam,
            "mean_lsb": round(float(d.mean()), 4),
            "p99_lsb": float(np.percentile(d, 99)),
            "max_lsb": int(d.max()),
            "frac_gt2": round(float((d > 2).mean()), 5),
        }), flush=True)


if __name__ == "__main__":
    main()
