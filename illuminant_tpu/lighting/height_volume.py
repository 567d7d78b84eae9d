"""Height-volume G-buffer rasterization (see sdf/height_volume.py for the
geometry/SDF SoA). Port of GBuffer.fx HeightVolume/HeightVolumeFace +
LightingRenderer.GBuffer.cs:221-265."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass  # noqa: F401 (re-export compat)
from ..sdf.height_volume import (  # noqa: F401 -- re-exported
    HeightVolume,
    HeightVolumes,
    POLYGON_XY_BIAS,
    extruded_polygon_distance,
    pack_height_volumes,
    polygon_sdf_2d,
)
from .environment import EnvironmentUniforms
from .gbuffer import GBuffer


def rasterize_height_volumes(gbuffer: GBuffer, volumes: HeightVolumes,
                             env: EnvironmentUniforms,
                             self_occlusion_z: float = 0.5) -> GBuffer:
    """Write top + front faces into the G-buffer (GBuffer.fx:75-105).

    Screen-space shear: geometry at height z appears at screen
    y = world_y - zToY * z. Depth resolve: highest z wins (the reference's
    GreaterEqual depth test over z/extent)."""
    h, w = gbuffer.shape
    scale = gbuffer.render_scale
    z_to_y = env.z_to_y_multiplier
    sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / scale
    sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / scale
    gy, gx = jnp.meshgrid(sy, sx, indexing="ij")

    z_top = volumes.z_range[:, 1][:, None, None]  # (P, 1, 1)
    z_base = volumes.z_range[:, 0][:, None, None]

    # --- top faces: world xy = (sx, sy + zToY * z_top) inside polygon.
    top_world = jnp.stack(
        [gx[None] + jnp.zeros_like(z_top), gy[None] + z_to_y * z_top],
        axis=-1,
    )  # (P, H, W, 2)
    sd_top = polygon_sdf_2d(
        top_world, volumes.vertices[:, None, None],
        volumes.next_vertices[:, None, None],
    )
    top_hit = (sd_top <= 0.0) & (volumes.active[:, None, None] > 0.5)

    # --- front faces: south-facing edge bands. A pixel shows the front
    # face at height z when the world point (sx, sy + zToY*z) lies on a
    # south edge; solve per edge for z in [z_base, z_top].
    a = volumes.vertices  # (P, E, 2)
    b = volumes.next_vertices
    ex = b[..., 0] - a[..., 0]
    ey = b[..., 1] - a[..., 1]
    # Outward normal of a CCW polygon edge is (ey, -ex); south-facing
    # (toward +y screen) when -ex... use normal.y = -ex > 0.
    south = (-ex) > 1e-6
    # Edge world y at x = sx (only valid within the x span).
    t_edge = (gx[None, :, :, None] - a[:, None, None, :, 0]) / jnp.where(
        jnp.abs(ex[:, None, None]) > 1e-6, ex[:, None, None], 1e9
    )
    in_span = (t_edge >= 0.0) & (t_edge <= 1.0)
    y_edge = a[:, None, None, :, 1] + t_edge * ey[:, None, None]
    # Solve sy + zToY*z = y_edge(z independent for straight extrusion):
    # z = (y_edge - sy) / zToY.
    z_hit = (y_edge - gy[None, :, :, None]) / jnp.maximum(z_to_y, 1e-6)
    valid = (
        in_span
        & south[:, None, None]
        & (z_hit >= z_base[..., None])
        & (z_hit <= z_top[..., None])
        & (volumes.active[:, None, None, None] > 0.5)
        & (z_to_y > 1e-6)
    )
    # Per volume: highest valid front-face z and its edge normal.
    z_front = jnp.max(jnp.where(valid, z_hit, -1e9), axis=-1)  # (P, H, W)
    front_hit = z_front > -1e8
    edge_idx = jnp.argmax(jnp.where(valid, z_hit, -1e9), axis=-1)
    elen = jnp.sqrt(jnp.maximum(ex * ex + ey * ey, 1e-12))
    nx_all = ey / elen
    ny_all = -ex / elen
    nx = jnp.take_along_axis(
        jnp.broadcast_to(nx_all[:, None, None], z_hit.shape),
        edge_idx[..., None], axis=-1,
    )[..., 0]
    ny = jnp.take_along_axis(
        jnp.broadcast_to(ny_all[:, None, None], z_hit.shape),
        edge_idx[..., None], axis=-1,
    )[..., 0]

    # --- depth resolve: candidates = (top z where top_hit) and (front z
    # where front_hit and not covered by a higher top).
    z_top_cand = jnp.where(top_hit, jnp.broadcast_to(z_top, top_hit.shape),
                           -1e9)
    z_front_cand = jnp.where(front_hit, z_front, -1e9)
    use_front = z_front_cand > z_top_cand
    z_cand = jnp.maximum(z_top_cand, z_front_cand)  # (P, H, W)
    best_p = jnp.argmax(z_cand, axis=0)  # (H, W)
    best_z = jnp.max(z_cand, axis=0)
    hit = best_z > -1e8

    def pick(per_volume):
        return jnp.take_along_axis(per_volume, best_p[None], axis=0)[0]

    front_sel = pick(use_front)
    normal = jnp.where(
        front_sel[..., None],
        jnp.stack([pick(nx), pick(ny), jnp.zeros_like(pick(nx))], axis=-1),
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 3)),
    )
    shadows = jnp.where(
        front_sel,
        pick(jnp.broadcast_to(
            volumes.front_shadows[:, None, None], z_cand.shape)),
        pick(jnp.broadcast_to(
            volumes.top_shadows[:, None, None], z_cand.shape)),
    )
    z_out = best_z + self_occlusion_z
    relative_y = z_out * z_to_y  # GBuffer.fx:85

    hit3 = hit[..., None]
    return gbuffer.replace(
        normal=jnp.where(hit3, normal, gbuffer.normal),
        relative_y=jnp.where(hit, relative_y, gbuffer.relative_y),
        z=jnp.where(hit, z_out, gbuffer.z),
        enable_shadows=jnp.where(hit, shadows, gbuffer.enable_shadows),
    )
