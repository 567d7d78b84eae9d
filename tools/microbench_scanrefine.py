"""Full-res scan-shadow dissection (parity row's dominant knob).

Times scan_visibility at 1080p for the flagship's 8 sphere lights over
the 4-primitive analytic scene, dissected:

  S0 refine=0 (pure flatland: scan + sector select only)
  S1 refine=1 (the parity setting: + 1 scene eval / (light, pixel))
  S2 refine=2
  OCC occlusion_image alone (the scan's input raster)
  EVAL one dense scene_sample_p at (8, H, W) (the refine's roofline)

Usage: python tools/microbench_scanrefine.py [half]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from illuminant_tpu.core.config import QualitySettings  # noqa: E402
from illuminant_tpu.lighting import scan_shadows as SS  # noqa: E402
from illuminant_tpu.sdf import analytic  # noqa: E402
from illuminant_tpu.lighting.environment import LightObstruction  # noqa: E402

ITERS = 100


def fence(x):
    return float(jnp.max(x[0, :64, 0].astype(jnp.float32)))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt * 1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    half = "half" in sys.argv
    H, W = (540, 960) if half else (1080, 1920)
    cx, cy = W * 0.5, H * 0.5
    ring = min(W, H) * 0.38
    obs = [
        LightObstruction.box((cx, cy, 24.0), (22.0, 22.0, 24.0)),
        LightObstruction.ellipsoid((cx - ring * 0.5, cy, 20.0),
                                   (28.0, 16.0, 20.0)),
        LightObstruction.cylinder((cx, cy - ring * 0.5, 26.0),
                                  (12.0, 12.0, 26.0)),
        LightObstruction.box((cx + ring * 0.45, cy + ring * 0.3, 16.0),
                             (30.0, 10.0, 16.0)),
    ]
    scene = analytic.pack_scene(obs, group_capacity_round=1)
    L = 8
    lp = jnp.stack([
        jnp.asarray([cx + ring * math.cos(2 * math.pi * i / L),
                     cy + ring * math.sin(2 * math.pi * i / L), 40.0],
                    jnp.float32)
        for i in range(L)
    ])
    lr = jnp.full((L,), 12.0, jnp.float32)
    ramp = jnp.full((L,), max(W, H) * 0.45, jnp.float32)

    def vis_fn(refine):
        q = QualitySettings(shadow_scale=1.0,
                            scan_refine_samples=refine)

        @jax.jit
        def go(img0, lp):
            def step(i, img):
                v = SS.scan_visibility(
                    scene, H, W, lp + img[0, 0, 0] * 1e-30, lr, ramp, q
                )
                return v.transpose(1, 2, 0)  # (H, W, L) for the fence

            return jax.lax.fori_loop(0, ITERS, step, img0)

        return go

    img0 = jnp.zeros((H, W, L), jnp.float32)
    for refine in (0, 1, 2):
        timed(f"S{refine} scan_visibility refine={refine} {W}x{H}",
              vis_fn(refine), img0, lp)

    @jax.jit
    def occ(img0, lp):
        def step(i, img):
            o = SS.occlusion_image(
                scene, H, W, 16.0 + img[0, 0] * 1e-30, 1.0,
                jnp.zeros((2,), jnp.float32))
            return o

        return jax.lax.fori_loop(0, ITERS, step, img0)

    o = occ(jnp.zeros((H, W), jnp.float32), lp)
    fence(o[:, :, None])
    t0 = time.perf_counter()
    o = occ(jnp.zeros((H, W), jnp.float32), lp)
    fence(o[:, :, None])
    print(f"{'OCC occlusion_image':44s} "
          f"{(time.perf_counter() - t0) / ITERS * 1e3:9.3f} ms/iter",
          flush=True)

    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    @jax.jit
    def dense_eval(img0, lp):
        def step(i, img):
            t = 0.6 + img[0, 0, 0] * 1e-30
            sx = lp[:, 0][:, None, None] + (xs - lp[:, 0][:, None, None]) * t
            sy = lp[:, 1][:, None, None] + (ys - lp[:, 1][:, None, None]) * t
            sz = lp[:, 2][:, None, None] * (1.0 - t)
            d = analytic.scene_sample_p(scene, sx, sy, sz)
            return d.transpose(1, 2, 0)

        return jax.lax.fori_loop(0, ITERS, step, img0)

    timed(f"EVAL dense scene_sample_p (L={L},{H},{W})", dense_eval,
          img0, lp)


if __name__ == "__main__":
    main()
