"""Full-res scan readout-layout experiments (parity row optimization).

The shipped scan_visibility moveaxis-transposes all 12 stored
(W/H-major, 2, L, minor) f16 scan outputs to (L, H, W) and sector-selects
there. Variants:

  B1  raw scan pair only (no transpose, no select) — the scan floor
  B1u raw scan pair at unroll 16 / 64
  B2  shipped readout (transpose 12, select in (L,H,W))  [= S0 ref]
  B3  native-layout select: select 6 -> transpose 3+3 -> final select
  B4  B3 without the neg_k lane (refine exit candidate dropped)

Usage: python tools/microbench_scan2.py [half]
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
    return float(jnp.max(x.reshape(-1)[:64].astype(jnp.float32)))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt * 1e3:9.3f} ms/iter", flush=True)
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
    lx = jnp.asarray([cx + ring * math.cos(2 * math.pi * i / L)
                      for i in range(L)], jnp.float32)
    ly = jnp.asarray([cy + ring * math.sin(2 * math.pi * i / L)
                      for i in range(L)], jnp.float32)
    lr = jnp.full((L,), 12.0, jnp.float32)
    occ = SS.occlusion_image(scene, H, W, 16.0, 1.0,
                             jnp.zeros((2,), jnp.float32))

    def b1(unroll):
        @jax.jit
        def go(occ):
            def step(i, acc):
                o = occ + acc * 1e-30
                outs = SS._bidirectional_scan(o, lx, ly, lr,
                                              unroll=unroll, raw=True)
                outs2 = SS._bidirectional_scan(o.T, ly, lx, lr,
                                               unroll=unroll, raw=True)
                # Full reductions keep every output live (slices would
                # let XLA drop most of the stores).
                r = sum(jnp.max(a.astype(jnp.float32))
                        for a in outs + outs2)
                return acc * 0.0 + r

            return jax.lax.fori_loop(0, ITERS, step,
                                     jnp.zeros((), jnp.float32))

        return go

    for unroll in (16, 32, 64):
        timed(f"B1 raw scan pair unroll={unroll}", b1(unroll), occ)

    # B2: the shipped full readout at refine=0.
    q0 = QualitySettings(shadow_scale=1.0, scan_refine_samples=0)

    @jax.jit
    def b2(occ_seed):
        lp = jnp.stack([lx, ly, jnp.full((L,), 40.0)], axis=-1)
        ramp = jnp.full((L,), max(W, H) * 0.45, jnp.float32)

        def step(i, img):
            v = SS.scan_visibility(
                scene, H, W,
                lp.at[0, 0].add(img[0, 0, 0] * 1e-30), lr, ramp, q0)
            return v.transpose(1, 2, 0)

        return jax.lax.fori_loop(0, ITERS, step,
                                 jnp.zeros((H, W, L), jnp.float32))

    timed("B2 shipped readout refine=0 (=S0)", b2, occ)

    # B3 / B4: native-layout select.
    def native(with_neg):
        @jax.jit
        def go(occ):
            def step(i, acc):
                o = occ + acc * 1e-30
                ew = SS._bidirectional_scan(o, lx, ly, lr, raw=True)
                ns = SS._bidirectional_scan(o.T, ly, lx, lr, raw=True)

                xs = jnp.arange(W, dtype=jnp.float32)
                ys = jnp.arange(H, dtype=jnp.float32)
                dxm = xs[:, None] - lx[None, :]           # (W, L)
                dym = ys[None, :] - ly[:, None]           # (L, H)
                east_m = dxm >= 0.0                        # (W, L)
                north_m = dym >= 0.0                       # (L, H)

                def sel_pair(arr, pos_mask):
                    # arr: (M, 2, L, m). Pass 1 ran on the flipped image:
                    # flip it back along the major axis, then pick the
                    # positive-side pass where the pixel is on that side.
                    a_pos = arr[:, 0]
                    a_neg = jnp.flip(arr[:, 1], axis=0)
                    return jnp.where(pos_mask[..., None], a_pos, a_neg)

                ew_sel = [sel_pair(a, east_m) for a in
                          (ew if with_neg else ew[:2])]  # (W, L, H) f16
                # ns arrays are (H, 2, L, W); mask (H, L).
                ns_sel = [sel_pair(a, north_m.T)
                          for a in (ns if with_neg else ns[:2])]
                ew_t = [a.transpose(1, 2, 0) for a in ew_sel]  # (L,H,W)
                ns_t = [a.transpose(1, 0, 2) for a in ns_sel]  # (L,H,W)

                adx = jnp.abs(xs[None, None, :] - lx[:, None, None])
                ady = jnp.abs(ys[None, :, None] - ly[:, None, None])
                horiz = adx >= ady
                outs = [
                    jnp.where(horiz, e.astype(jnp.float32),
                              n.astype(jnp.float32))
                    for e, n in zip(ew_t, ns_t)
                ]
                r = outs[0]
                for o2 in outs[1:]:
                    r = r + o2
                # Keep every lane live with a full reduction (slicing
                # would let XLA skip most of the select work).
                return acc * 0.0 + jnp.max(r)

            return jax.lax.fori_loop(0, ITERS, step,
                                     jnp.zeros((), jnp.float32))

        return go

    timed("B3 native select (6 sel, 6 transp, 3 out)", native(True), occ)
    timed("B4 native select w/o neg_k lane", native(False), occ)


if __name__ == "__main__":
    main()
