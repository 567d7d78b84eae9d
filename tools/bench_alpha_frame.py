"""Realtime ordered-alpha FRAME at the documented operating point
(VERDICT r3 #9): 1080p, bin_capacity K=128, analytic rounded discs,
'over'-composited back-to-front by ZFormula over a lit background —
the ~0.17 ms/slot microbench bound (PERF.md log #15) exercised as a
whole animated frame, fps recorded.

Usage: python tools/bench_alpha_frame.py [frames] [K]
"""

from __future__ import annotations

import json
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

from illuminant_tpu.particles.state import ParticleState  # noqa: E402
from illuminant_tpu.raster.render import render_particles  # noqa: E402
from illuminant_tpu.raster.tiled import TiledRasterConfig  # noqa: E402

H, W = 1080, 1920
N = 1 << 16  # 64k alpha particles (typical smoke/foliage layer scale)


def build(k):
    rng = np.random.default_rng(11)
    pos = np.zeros((N, 4), np.float32)
    pos[:, 0] = rng.uniform(0, W, N)
    pos[:, 1] = rng.uniform(0, H, N)
    pos[:, 2] = rng.uniform(0, 64, N)  # depth: ZFormula orders by it
    pos[:, 3] = 1.0
    rc = np.zeros((N, 4), np.float32)
    a = rng.uniform(0.25, 0.6, N)
    rc[:, 0] = rng.uniform(0.4, 0.9, N) * a
    rc[:, 1] = rng.uniform(0.4, 0.7, N) * a
    rc[:, 2] = rng.uniform(0.3, 0.5, N) * a
    rc[:, 3] = a
    rd = np.zeros((N, 4), np.float32)
    rd[:, 0] = rng.uniform(3.0, 9.0, N)
    state = ParticleState.empty(N).replace(
        position=jnp.asarray(pos), render_color=jnp.asarray(rc),
        render_data=jnp.asarray(rd))
    drift = jnp.asarray(rng.uniform(-40, 40, (N, 2)), jnp.float32)

    cfg = TiledRasterConfig(height=H, width=W, tile=32, bin_capacity=k,
                            apron=5, rgba8_colors=False, channels=4,
                            overflow_tiles=0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    bg = np.stack(
        [0.15 + 0.45 * np.exp(-((xx - W / 2) ** 2 + (yy - H / 2) ** 2)
                              / (0.08 * W * H))] * 3
        + [np.ones((H, W))], axis=-1).astype(np.float32)
    bg = jnp.asarray(bg)

    @jax.jit
    def frame(state, i):
        t = i.astype(jnp.float32) / 60.0
        p = state.position.at[:, :2].add(
            drift * jnp.sin(t * 0.7)[None])
        st = state.replace(position=p)
        img, diag = render_particles(
            st, cfg, additive_blend=False, background=bg,
            z_formula=(0.0, 0.0, 1.0, 0.0))
        return img, diag["dropped"]

    return state, frame


def fence(x):
    return float(jnp.max(x[::257, 0, 0].astype(jnp.float32)))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    state, frame = build(k)
    img, drops = frame(state, jnp.asarray(0, jnp.int32))
    fence(img)
    t0 = time.perf_counter()
    dmax = 0
    for i in range(frames):
        img, drops = frame(state, jnp.asarray(i, jnp.int32))
    fence(img)
    dt = time.perf_counter() - t0
    dmax = int(drops)
    fps = frames / dt
    print(json.dumps({
        "metric": "1080p ordered-alpha frame (analytic discs, "
                  f"K={k}, N={N}, ZFormula back-to-front over "
                  "background)",
        "fps": round(fps, 2),
        "ms_per_frame": round(1e3 * dt / frames, 2),
        "dropped_last": dmax,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
