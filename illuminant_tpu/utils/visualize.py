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
