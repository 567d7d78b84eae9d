"""Scan-propagated soft shadows: the TPU-native fast path.

The reference cone-traces every (pixel, light) ray through the SDF with a
64-step budget (ConeTrace.fxh) — cheap on GPUs with texture caches, hopeless
on TPU where per-element gathers serialize. This module reformulates the
same math as a GATHER-FREE column scan:

  * One dense analytic occlusion image `occ[y, x] = scene_sdf(pixel)` per
    frame (shared by every light) — pure vector math over the pixel grid.
  * Per light, visibility propagates outward column-by-column (lax.scan).
    A ray to pixel (x, y) passes the previous column at
    y_src = y - (y - y_l)/(x - x_l), which for the sector's own wedge
    (|slope| <= 1) is always within +-1 row — so the propagation step is a
    lerp of static +-1 rolls. Four sector passes (E/W and N/S on the
    transpose) cover the plane.
  * The carry is (min distance along ray, arg-distance of that min) — an
    associative min+argmin — and the pixel reads the carry BEFORE its own
    column sample merges (the trace-initial-offset exclusion).
  * Readout applies the reference's cone formula at the pixel:
    vis = (d* + HACK_DISTANCE_OFFSET) / cone_radius(u*) with the radius
    grown from the pixel toward the light (createTraceConfig,
    ConeTrace.fxh:122-139) evaluated at the blocking sample's distance,
    then the shadowed/unshadowed thresholds and occlusion power
    (fxh:182-189).

Exactness vs the reference march: the scan takes the TRUE minimum along
the ray (the march approximates it with adaptive steps), so edges are
slightly cleaner. Two deliberate approximations, both documented quality
trade-offs of the fast path (the march in cone_trace.py remains the exact
oracle):
  * the cone radius divides the single arg-min sample instead of every
    sample (penumbra growth behavior matches; deep-umbra values can differ
    slightly);
  * occlusion is evaluated at one trace height `trace_z` instead of along
    the ray's z ascent toward the light (exact for tall extruded
    obstructions; short obstructions cast slightly longer shadows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import QualitySettings
from ..sdf.analytic import AnalyticScene
from ..core.pytree import named_scope
from .cone_trace import (
    FULLY_SHADOWED_THRESHOLD,
    HACK_DISTANCE_OFFSET,
    MIN_CONE_RADIUS,
    UNSHADOWED_THRESHOLD,
)

_BIG = 1e9


def occlusion_image(scene: AnalyticScene, height: int, width: int, trace_z,
                    render_scale: float = 1.0):
    """Dense scene distance at every pixel center, at height trace_z."""
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / render_scale
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / render_scale
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pos = jnp.stack([gx, gy, jnp.broadcast_to(trace_z, gx.shape)], axis=-1)
    return scene.distance(pos)


def _bidirectional_scan(occ, light_x, light_y, light_radius, unroll=32):
    """Both half-plane passes in ONE lax.scan (the reverse pass runs on the
    flipped image as a batch row — halves the sequential op count; unroll
    amortizes per-step overhead). occ: (H, W); light_x/y/radius: (L,).

    Returns ((e_d, e_k), (w_d, w_k)): (L, H, W) pre-merge carries — the min
    scene distance along each pixel's ray (excluding the pixel's own
    column) and the horizontal distance from the light where it occurred.
    """
    H, W = occ.shape
    L = light_x.shape[0]
    ys = jnp.arange(H, dtype=jnp.float32)[None, None, :]  # (1, 1, H)

    cols = jnp.arange(W, dtype=jnp.float32)
    # Row 0: east pass on occ; row 1: west pass on the flipped image with
    # a mirrored light x.
    occ_fwd = occ.T  # (W, H)
    occ_rev = occ.T[::-1]
    occ_both = jnp.stack([occ_fwd, occ_rev], axis=1)  # (W, 2, H)

    lx = jnp.stack([light_x, (W - 1.0) - light_x], axis=0)[:, :, None]
    ly = jnp.broadcast_to(light_y[None, :, None], (2, L, 1))
    lr = jnp.broadcast_to(light_radius[None, :, None], (2, L, 1))

    def step(carry, inputs):
        min_d, min_k = carry  # (2, L, H)
        x, occ_col = inputs  # (), (2, H)
        dx = x - lx  # (2, L, 1)
        in_front = dx >= 1.0

        # Resample the carry along the ray fan: y_src = y - f,
        # f = (y - yl)/dx in [-1, 1] inside the wedge.
        f = (ys - ly) / jnp.maximum(dx, 1.0)
        f = jnp.clip(f, -1.0, 1.0)

        up_d = jnp.roll(min_d, 1, axis=2)  # index y -> value at y-1
        dn_d = jnp.roll(min_d, -1, axis=2)
        up_k = jnp.roll(min_k, 1, axis=2)
        dn_k = jnp.roll(min_k, -1, axis=2)
        af = jnp.abs(f)
        near = 1.0 - af
        res_d = min_d * near + jnp.where(f >= 0.0, up_d, dn_d) * af
        res_k = min_k * near + jnp.where(f >= 0.0, up_k, dn_k) * af
        # Outside the light's half-plane nothing has accumulated yet.
        res_d = jnp.where(in_front, res_d, _BIG)
        res_k = jnp.where(in_front, res_k, 0.0)

        # Merge this column's own sample (skipped within the light radius —
        # the trace stops `radius` short of the light, ConeTrace.fxh:46).
        sample_valid = in_front & (dx > lr)
        d_here = jnp.where(sample_valid, occ_col[:, None, :], _BIG)
        new_min_d = jnp.minimum(res_d, d_here)
        new_min_k = jnp.where(d_here < res_d, dx, res_k)
        return (new_min_d, new_min_k), (res_d, res_k)

    init = (
        jnp.full((2, L, H), _BIG, jnp.float32),
        jnp.zeros((2, L, H), jnp.float32),
    )
    _, (pre_d, pre_k) = jax.lax.scan(
        step, init, (cols, occ_both), unroll=unroll
    )
    # (W, 2, L, H) -> (2, L, H, W).
    pre_d = jnp.moveaxis(pre_d, 0, 3)
    pre_k = jnp.moveaxis(pre_k, 0, 3)
    east = (pre_d[0], pre_k[0])
    west = (pre_d[1, :, :, ::-1], pre_k[1, :, :, ::-1])
    return east, west


@named_scope("illuminant/scan_shadows")
def scan_visibility(
    scene: AnalyticScene,
    height: int,
    width: int,
    light_position,  # (L, 3)
    light_radius,  # (L,)
    light_ramp_length,  # (L,)
    quality: QualitySettings,
    trace_z=None,
    render_scale: float = 1.0,
    pixel_z=None,
):
    """Cone-trace-equivalent visibility for all lights -> (L, H, W).

    `pixel_z` (H, W): shaded-surface heights. The occlusion image lives at
    one trace height, so pixels standing ABOVE it (height-volume tops)
    would self-shadow; their true rays clear the occluders, so visibility
    fades back to 1 as the surface rises past the trace plane (the 3D
    march has no such artifact — see PERF.md approximations)."""
    lx = light_position[:, 0] * render_scale
    ly = light_position[:, 1] * render_scale
    lz = light_position[:, 2]
    if trace_z is None:
        trace_z = jnp.mean(lz) * 0.4
    occ = occlusion_image(scene, height, width, trace_z, render_scale)

    (e_d, e_k), (w_d, w_k) = _bidirectional_scan(
        occ, lx, ly, light_radius
    )
    (n_pair, s_pair) = _bidirectional_scan(occ.T, ly, lx, light_radius)
    n_d = jnp.swapaxes(n_pair[0], 1, 2)
    n_k = jnp.swapaxes(n_pair[1], 1, 2)
    s_d = jnp.swapaxes(s_pair[0], 1, 2)
    s_k = jnp.swapaxes(s_pair[1], 1, 2)

    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    dx = xs - lx[:, None, None]
    dy = ys - ly[:, None, None]
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)

    # Sector select: E/W own |dy| <= |dx|, N/S the rest.
    horiz = adx >= ady
    east = horiz & (dx >= 0.0)
    west = horiz & (dx < 0.0)
    north = (~horiz) & (dy >= 0.0)

    min_d = jnp.where(
        east, e_d,
        jnp.where(west, w_d, jnp.where(north, n_d, s_d)),
    )
    min_k = jnp.where(
        east, e_k,
        jnp.where(west, w_k, jnp.where(north, n_k, s_k)),
    )

    # Convert horizontal distances to along-ray distances (the scan walks
    # the major axis; the ray is longer by sec = ray_len / major_extent).
    major = jnp.maximum(jnp.maximum(adx, ady), 1e-3)
    dz = jnp.broadcast_to(trace_z - lz[:, None, None], major.shape)
    ray_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    sec = ray_len / major
    u = jnp.maximum((major - min_k) * sec, 0.0)  # dist from pixel to blocker

    # createTraceConfig (ConeTrace.fxh:122-139) + coneTraceStep (fxh:51-71).
    max_radius = jnp.clip(
        light_radius[:, None, None], MIN_CONE_RADIUS,
        quality.max_cone_radius,
    )
    ramp = jnp.maximum(light_ramp_length[:, None, None], 16.0)
    growth = max_radius / ramp * quality.cone_growth_factor
    local_radius = jnp.minimum(growth * u + MIN_CONE_RADIUS, max_radius)

    vis = jnp.minimum(
        (min_d + HACK_DISTANCE_OFFSET) / local_radius, 1.0
    )
    final = (
        jnp.clip(
            jnp.clip(vis - FULLY_SHADOWED_THRESHOLD, 0.0, 1.0)
            / (UNSHADOWED_THRESHOLD - FULLY_SHADOWED_THRESHOLD),
            0.0,
            1.0,
        )
        ** quality.occlusion_to_opacity_power
    )
    if pixel_z is not None:
        elevated = jnp.clip((pixel_z[None] - trace_z) / 8.0, 0.0, 1.0)
        final = final + (1.0 - final) * elevated
    return final


def upsample2x_bilinear(v):
    """Elementwise bilinear 2x upsample over the last two axes (faster
    than jax.image.resize for the fixed 2x case; used by the shadow-scale
    path)."""
    def axis_up(x, axis):
        n = x.shape[axis]
        first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        lo = jnp.concatenate([first, x], axis=axis)
        hi = jnp.concatenate([x, last], axis=axis)
        a = 0.75 * x + 0.25 * jax.lax.slice_in_dim(lo, 0, n, axis=axis)
        b = 0.75 * x + 0.25 * jax.lax.slice_in_dim(hi, 1, n + 1, axis=axis)
        stacked = jnp.stack([a, b], axis=axis + 1)
        new_shape = list(x.shape)
        new_shape[axis] = 2 * n
        return stacked.reshape(new_shape)

    return axis_up(axis_up(v, v.ndim - 2), v.ndim - 1)
