"""Isolate the carried-interval refine (round 5): scan visibility with
the ColumnField elementwise refine vs the exact scattered-sample refine
on the same voxel volume, and vs the analytic scene.

Usage: python tools/debug_carried_refine.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from illuminant_tpu.scenes import build_flagship
from illuminant_tpu.lighting import scan_shadows as SS
from illuminant_tpu.sdf import volume as vol
from illuminant_tpu.sdf.columns import build_column_maps
from illuminant_tpu.sdf import analytic as A


def main():
    kw = dict(height=96, width=160, capacity=1 << 10, spawn_max=128,
              n_lights=4)
    sv = build_flagship(field="voxel", sdf_resolution_scale=0.5, **kw)
    sa = build_flagship(sdf_resolution_scale=0.5, **kw)
    q = sv.config.quality

    # Static partition only (isolates the refine math from the dynamic
    # regen): ColumnField of the baked volume vs the volume itself.
    volume = sv.volume
    cf = build_column_maps(volume)
    an = sa.volume

    lights = sv.sphere_lights
    lp = lights.position
    lr = lights.properties[:, 0]
    rl = lights.properties[:, 1]
    act = lights.active

    if "--nom1" in sys.argv:
        q = q.replace(scan_nomination_scale=1.0)
    if "--refine0" in sys.argv:
        q = q.replace(scan_refine_samples=0)

    def vis_for(scene):
        return SS.scan_cone_visibility(
            scene, sv.gbuffer, lp, lr, rl, q,
            light_active=act)

    with A.interp_dispatch("always"):
        v_cols = np.asarray(vis_for(cf), np.float32)
        v_exact = np.asarray(vis_for(volume), np.float32)
        v_anal = np.asarray(vis_for(an), np.float32)

    def stats(name, a, b):
        d = np.abs(a - b)
        print(f"{name}: mean {d.mean():.4f}  p99 {np.percentile(d, 99):.4f}"
              f"  max {d.max():.4f}  frac>0.1 {(d > 0.1).mean():.4f}")

    stats("cols  vs exact ", v_cols, v_exact)
    stats("cols  vs analyt", v_cols, v_anal)
    stats("exact vs analyt", v_exact, v_anal)

    # Localize the worst pixel.
    d = np.abs(v_cols - v_exact)
    li, yi, xi = np.unravel_index(np.argmax(d), d.shape)
    print(f"worst: light {li} px ({yi},{xi}) cols={v_cols[li, yi, xi]:.3f} "
          f"exact={v_exact[li, yi, xi]:.3f} anal={v_anal[li, yi, xi]:.3f}")


if __name__ == "__main__":
    main()
