"""Distance-field visualization: the editor's SDF debug raymarcher.

Port of /root/reference/Illuminant/Lighting/LightingRenderer.cs
VisualizeDistanceField (:1699-1892) + Shaders/VisualizeCommon.fxh
traceSurface/traceOutlines: orthographic rays march the scene SDF and
shade hits as surfaces (normal-lit) or outlines (distance rings). Used by
the DistanceFieldEditor scene and `demo.py visualize_sdf`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sdf.analytic import scene_normal, scene_sample

# VisualizeCommon.fxh:1-7.
SMALL_STEP_FACTOR = 1.0
EPSILON = 0.5
OUTLINE_SIZE = 1.8

VIS_SURFACES = 0
VIS_OUTLINES = 1


def visualize_distance_field(
    field,
    height: int,
    width: int,
    mode: int = VIS_SURFACES,
    ray_direction=(0.0, 0.0, -1.0),
    start_z: float = 128.0,
    max_steps: int = 64,
    light_direction=(-0.35, -0.35, -0.87),
):
    """-> (H, W, 4) visualization image.

    Orthographic rays from z=start_z along ray_direction (the reference
    casts from the view plane, VisualizeDistanceFieldVertex rays). Surfaces
    mode shades hits with a simple n.l; outlines mode draws distance
    isolines near the surface.
    """
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    origin = jnp.stack(
        [gx, gy, jnp.full_like(gx, start_z)], axis=-1
    )
    d = jnp.asarray(ray_direction, jnp.float32)
    d = d / jnp.sqrt(jnp.maximum(jnp.sum(d * d), 1e-12))

    def body(state):
        t, hit, live = state
        pos = origin + d * t[..., None]
        dist = scene_sample(field, pos)
        new_hit = dist <= EPSILON
        step = jnp.maximum(jnp.abs(dist) * SMALL_STEP_FACTOR, 0.5)
        t = jnp.where(live & ~new_hit, t + step, t)
        below = (origin[..., 2] + d[2] * t) < -1.0
        live = live & ~new_hit & ~below & (t < 4096.0)
        return t, hit | new_hit, live

    def cond(state):
        _, _, live = state
        return jnp.any(live)

    t0 = jnp.zeros((height, width), jnp.float32)
    live0 = jnp.ones((height, width), bool)
    hit0 = jnp.zeros((height, width), bool)
    t, hit, _ = jax.lax.while_loop(cond, body, (t0, hit0, live0))

    pos = origin + d * t[..., None]
    if mode == VIS_SURFACES:
        n = scene_normal(field, pos)
        l = jnp.asarray(light_direction, jnp.float32)
        l = l / jnp.sqrt(jnp.maximum(jnp.sum(l * l), 1e-12))
        diffuse = jnp.clip(jnp.sum(n * -l, axis=-1), 0.0, 1.0)
        shade = 0.2 + 0.8 * diffuse
        rgb = jnp.stack([shade, shade * 0.95, shade * 0.9], axis=-1)
        rgb = jnp.where(hit[..., None], rgb, 0.0)
    else:
        # Outlines: rings of the 2D distance at the ground plane.
        ground = jnp.concatenate(
            [origin[..., :2], jnp.zeros_like(origin[..., :1])], axis=-1
        )
        dist = scene_sample(field, ground)
        ring = jnp.abs(jnp.mod(dist, 16.0) - 8.0) < OUTLINE_SIZE
        surface = jnp.abs(dist) < OUTLINE_SIZE
        rgb = jnp.stack(
            [
                surface.astype(jnp.float32),
                ring.astype(jnp.float32) * 0.5,
                jnp.where(dist < 0.0, 0.35, 0.0),
            ],
            axis=-1,
        )
    alpha = jnp.ones((height, width, 1), jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)


def draw_histogram(
    result,
    width: int = 256,
    height: int = 96,
    percentiles=(),
    range_min=None,
    range_max=None,
    max_input_value: float = 64.0,
    sample_count_power: float = 2.0,
):
    """HistogramVisualizer.Draw (Histogram.cs:250-345), host-side numpy.

    Bars span each bucket's value range on a linear x axis; bar height is
    the average of the linear and log-scaled counts (:281-287); value
    colors ramp black->white->yellow->red by bucket luminance; percentile
    and median markers are vertical lines; the tonemap range is a dim
    band. Returns (height, width, 4) float RGBA.
    """
    import numpy as np

    from .histogram import percentile as pct

    counts = np.asarray(result.counts, np.float64)
    bounds = np.asarray(result.boundaries, np.float64)
    img = np.zeros((height, width, 4), np.float32)
    img[:] = np.asarray([0.098, 0.098, 0.439, 0.75], np.float32)  # bg

    value_colors = np.asarray(
        [[0, 0, 0], [1, 1, 1], [1, 1, 0], [1, 0, 0]], np.float32
    )
    total = max(counts.sum(), 1.0)
    log_max = np.log(total + 1.0) / np.log(sample_count_power)

    if range_min is not None or range_max is not None:
        lo = 0.0 if range_min is None else range_min
        hi = max_input_value if range_max is None else range_max
        x1 = int(np.clip(lo / max_input_value, 0, 1) * (width - 1))
        x2 = int(np.clip(hi / max_input_value, 0, 1) * (width - 1))
        img[:, x1:x2 + 1, :3] += 0.15

    start = 0.0
    for i, c in enumerate(counts):
        end = bounds[i]
        x1 = int(np.clip(start / max_input_value, 0, 1) * (width - 1))
        x2 = max(x1 + 1, int(np.clip(end / max_input_value, 0, 1)
                             * (width - 1)))
        scaled = c / total
        scaled_log = (np.log(c + 1.0) / np.log(sample_count_power)
                      / max(log_max, 1e-9))
        bar = (scaled + scaled_log) * 0.5
        y1 = int(round((1.0 - bar) * (height - 1)))
        value = (start + end) / 2.0
        lo_i = int(np.clip(np.floor(value), 0, len(value_colors) - 1))
        hi_i = min(lo_i + 1, len(value_colors) - 1)
        t = float(np.clip(value - np.floor(value), 0, 1))
        color = value_colors[lo_i] * (1 - t) + value_colors[hi_i] * t
        img[y1:, x1:x2, :3] = color
        img[y1:, x1:x2, 3] = 1.0
        start = end

    def vline(value, color):
        x = int(np.clip(value / max_input_value, 0, 1) * (width - 1))
        img[:, x, :3] = color
        img[:, x, 3] = 1.0

    for p in percentiles:
        vline(float(pct(result, p)), np.asarray([1, 1, 1], np.float32))
    vline(float(pct(result, 50.0)),
          np.asarray([0.0, 1.0, 0.5], np.float32))  # median, SpringGreen

    img[0, :, :] = [1, 1, 1, 1]
    img[-1, :, :] = [1, 1, 1, 1]
    img[:, 0, :] = [1, 1, 1, 1]
    img[:, -1, :] = [1, 1, 1, 1]
    return img


def visualize_bezier(bezier, width: int = 256, height: int = 128,
                     x_min: float = 0.0, x_max: float = 1.0):
    """VisualizeBezier.fx equivalent: plot each channel's curve over
    [x_min, x_max] -> (height, width, 4) float RGBA (channel colors
    r/g/b/white)."""
    import numpy as np

    from ..ops.bezier import evaluate_bezier

    xs = np.linspace(x_min, x_max, width, dtype=np.float32)
    ys = np.asarray(evaluate_bezier(bezier, xs))  # (W, C)
    lo = float(ys.min())
    hi = float(ys.max())
    span = max(hi - lo, 1e-6)
    img = np.zeros((height, width, 4), np.float32)
    img[..., 3] = 1.0
    chan_colors = np.asarray(
        [[1, 0.3, 0.3], [0.3, 1, 0.3], [0.4, 0.5, 1], [1, 1, 1]],
        np.float32,
    )
    for c in range(ys.shape[1]):
        yy = np.clip(
            ((hi - ys[:, c]) / span * (height - 1)).astype(np.int64),
            0, height - 1,
        )
        img[yy, np.arange(width), :3] = chan_colors[c % 4]
    return img
