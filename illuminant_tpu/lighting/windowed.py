"""Windowed (bounded) light evaluation.

The reference never shades a light over the whole screen: every light
draws as an instanced quad covering just its bounds
(/root/reference/Illuminant/Lighting/LightingRenderer.cs:1149-1166 — the
VS expands per-light corner vertices, SphereLightCore.fxh:13-56), so a
small volumetric or projector light touches only its own pixels. The TPU
analog: cut a fixed-size window of the G-buffer around the light
(`GBuffer.window` — static shape, traced origin, so one compiled kernel
serves every light position), evaluate the family core on the window,
and add the result back at the traced origin. Full-screen evaluation
stays right for lights whose bounds cover the frame (the flagship's
sphere lights with ~0.45*max(W,H) ramps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def window_origin(center_xy_px, win_h: int, win_w: int, height: int,
                  width: int):
    """Clamp a window centered at `center_xy_px` (pixels, traced) into
    the frame. Returns int32 (oy, ox)."""
    cx = center_xy_px[0]
    cy = center_xy_px[1]
    ox = jnp.clip(jnp.round(cx - win_w * 0.5).astype(jnp.int32), 0,
                  max(width - win_w, 0))
    oy = jnp.clip(jnp.round(cy - win_h * 0.5).astype(jnp.int32), 0,
                  max(height - win_h, 0))
    return oy, ox


def add_window(lightmap, contrib, oy, ox):
    """lightmap[oy:oy+wh, ox:ox+ww, :C] += contrib (C <= lightmap's C)."""
    wh, ww, c = contrib.shape
    cur = lax.dynamic_slice(lightmap, (oy, ox, 0),
                            (wh, ww, lightmap.shape[-1]))
    if c > lightmap.shape[-1]:
        contrib = contrib[..., :lightmap.shape[-1]]
    elif c < lightmap.shape[-1]:
        contrib = jnp.concatenate(
            [contrib,
             jnp.zeros((wh, ww, lightmap.shape[-1] - c), contrib.dtype)],
            axis=-1,
        )
    return lax.dynamic_update_slice(lightmap, cur + contrib, (oy, ox, 0))


def accumulate_windowed(lightmap, gbuffer, centers_px, win: int,
                        accum_window):
    """Per-light bounded accumulation.

    centers_px: (L, 2) traced pixel centers. `accum_window(i, gb_win)`
    -> (win, win, C) contribution of light i over the window. The Python
    loop over L unrolls (light capacity is static); each iteration is
    one dynamic_slice + family core + dynamic_update_slice."""
    h, w = gbuffer.shape
    win_h = min(win, h)
    win_w = min(win, w)
    n = centers_px.shape[0]
    for i in range(n):
        oy, ox = window_origin(centers_px[i], win_h, win_w, h, w)
        gb_win = gbuffer.window(oy, ox, win_h, win_w)
        contrib = accum_window(i, gb_win)
        lightmap = add_window(lightmap, contrib.astype(lightmap.dtype),
                              oy, ox)
    return lightmap
