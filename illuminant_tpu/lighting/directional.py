"""Directional lights.

Port of /root/reference/Illuminant/Shaders/DirectionalLight.fx and
DirectionalLightSource (Lighting/LightSource.cs:105-212): a light direction
(or none -> pure ambient term), normal-factor opacity with the directional
dot constants (LightCommon.fxh:7-8, 224-231), AO, and shadows traced toward
a fake light center `pixel - direction * shadowTraceLength`
(DirectionalLight.fx:76-83) with (softness, rampRate) shaping the cone.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import QualitySettings
from ..core.pytree import pytree_dataclass
from .cone_trace import cone_trace
from .environment import EnvironmentUniforms
from .gbuffer import GBuffer
from .sphere import compute_ao, compute_normal_factor

# LightCommon.fxh:7-8.
DIRECTIONAL_DOT_OFFSET = 0.35
DIRECTIONAL_DOT_RAMP_RANGE = 0.35
# DirectionalLight.fx:13.
SELF_OCCLUSION_HACK = 1.5


@pytree_dataclass
class DirectionalLights:
    """SoA; direction (L, 4) with .w = has-direction flag (0 -> ambient,
    LightSource.cs DirectionalLightSource.Direction nullable)."""

    direction: jnp.ndarray  # (L, 4) normalized xyz + flag
    color: jnp.ndarray  # (L, 4) opacity pre-folded
    # (cast_shadows, trace_length, softness, ramp_rate) (fx:57).
    properties: jnp.ndarray  # (L, 4)
    # (ao_radius, distance_falloff, _, ao_opacity).
    more: jnp.ndarray  # (L, 4)
    active: jnp.ndarray  # (L,)

    @property
    def capacity(self) -> int:
        return self.direction.shape[0]


@dataclasses.dataclass
class DirectionalLightSource:
    """Host-side (LightSource.cs:105-212)."""

    direction: Optional[Tuple[float, float, float]] = (0.0, 0.0, -1.0)
    color: tuple = (1.0, 1.0, 1.0, 1.0)
    opacity: float = 1.0
    cast_shadows: bool = True
    shadow_trace_length: float = 256.0
    shadow_softness: float = 12.0
    shadow_ramp_rate: float = 0.5
    shadow_distance_falloff: Optional[float] = None
    ambient_occlusion_radius: float = 0.0
    ambient_occlusion_opacity: float = 1.0
    # LightSource.BlendMode (LightSource.cs:65): additive | subtractive
    # | max composition onto the lightmap (see environment.py).
    blend_mode: str = "additive"


def pack_directional_lights(lights: List[DirectionalLightSource],
                            capacity: Optional[int] = None
                            ) -> DirectionalLights:
    n = len(lights)
    cap = capacity or max(n, 1)
    direction = np.zeros((cap, 4), np.float32)
    color = np.zeros((cap, 4), np.float32)
    props = np.zeros((cap, 4), np.float32)
    more = np.zeros((cap, 4), np.float32)
    more[:, 3] = 1.0
    active = np.zeros((cap,), np.float32)
    for i, l in enumerate(lights):
        if l.direction is not None:
            d = np.asarray(l.direction, np.float32)
            norm = np.linalg.norm(d)
            if norm > 0:
                d = d / norm
            direction[i] = [*d, 1.0]
        col = np.asarray(l.color, np.float32).copy()
        col[3] *= l.opacity
        color[i] = col
        props[i] = [
            1.0 if l.cast_shadows else 0.0,
            l.shadow_trace_length,
            l.shadow_softness,
            l.shadow_ramp_rate,
        ]
        more[i] = [
            l.ambient_occlusion_radius,
            l.shadow_distance_falloff or 0.0,
            0.0,
            l.ambient_occlusion_opacity,
        ]
        active[i] = 1.0
    return DirectionalLights(
        direction=jnp.asarray(direction),
        color=jnp.asarray(color),
        properties=jnp.asarray(props),
        more=jnp.asarray(more),
        active=jnp.asarray(active),
    )


def compute_directional_opacity(light_direction, shaded_normal):
    """computeDirectionalLightOpacity (LightCommon.fxh:224-231)."""
    factor = compute_normal_factor(
        light_direction[..., :3], shaded_normal,
        DIRECTIONAL_DOT_OFFSET, DIRECTIONAL_DOT_RAMP_RANGE,
    )
    return jnp.where(light_direction[..., 3] < 0.1, 1.0, factor)


def _scan_pseudo_centers(gbuffer: GBuffer, lights: DirectionalLights,
                         env: EnvironmentUniforms):
    """Far pseudo light centers for the scan path.

    Parallel directional rays are the limit of the radial scan with the
    center pushed far along -direction: a center at in-plane distance D
    from the screen center bounds the ray-direction error across the
    screen by atan(half_diagonal / D). The z coordinate is placed at
    slope -dz/|d_xy| so the scan readout's 3D `sec` factor (and hence
    the trace-length cap and refine-sample ray heights) reproduces the
    TRUE directional ray, not an approximation.

    Returns (centers (L, 3), horizontal trace plane z, D).
    """
    h, w = gbuffer.shape
    rs = gbuffer.render_scale
    d = lights.direction
    n_xy = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    # Near-vertical lights (|d_xy| -> 0) have no in-plane shadow travel;
    # clamping keeps the geometry finite (their shadows are ~degenerate
    # in the march too: the fake center sits almost straight above).
    safe = jnp.maximum(n_xy, 0.05)
    u_xy = d[:, :2] / safe[:, None]
    diag = float(np.hypot(h, w))
    dist = 4.0 * diag / rs  # ray-angle error <= atan(1/8) ~ 7deg
    z0 = jnp.mean(gbuffer.z)
    cx = 0.5 * w / rs
    cy = 0.5 * h / rs + jnp.mean(gbuffer.relative_y)
    centers = jnp.stack(
        [
            cx - u_xy[:, 0] * dist,
            cy - u_xy[:, 1] * dist,
            z0 - d[:, 2] / safe * dist,
        ],
        axis=-1,
    )
    # Occlusion-image height: the ray climbs -dz over the trace budget,
    # but blockers only matter where the ray is LOW (within obstruction
    # height of the ground) — a plane above every obstruction top
    # nominates nothing and the shadows vanish. Over-nomination is safe
    # (the 3D refine rejects blockers the true ray clears), so cap the
    # plane inside the environment's height band and bias low.
    rise = jnp.maximum(-d[:, 2], 0.0) * lights.properties[:, 1]
    wsum = jnp.maximum(jnp.sum(lights.active), 1.0)
    rise_mean = jnp.sum(rise * lights.active) / wsum
    band = jnp.maximum(env.maximum_z - env.ground_z, 1.0)
    trace_plane = z0 + jnp.minimum(0.4 * rise_mean, 0.25 * band)
    return centers, trace_plane, dist


def directional_scan_args(gbuffer: GBuffer, lights: DirectionalLights,
                          env: EnvironmentUniforms):
    """Radial-scan arguments for directional lights — (centers (L, 3),
    radius (L,), ramp (L,), max_trace_distance (L,), trace_plane ()).
    Mirrors the in-family scan branch so a fused multi-family scan
    (scenes.py) can batch the sun with radial lights."""
    centers, trace_plane, _ = _scan_pseudo_centers(gbuffer, lights, env)
    ramp = jnp.maximum(lights.more[:, 1], 16.0) / jnp.maximum(
        lights.properties[:, 3], 1e-3
    )
    return (centers, lights.properties[:, 2], ramp,
            lights.properties[:, 1], trace_plane)


def accumulate_directional_lights(
    volume,
    gbuffer: GBuffer,
    lights: DirectionalLights,
    env: EnvironmentUniforms,
    quality: QualitySettings,
    shadow_mode: str = "march",
    scan_visibility_precomputed=None,
    with_ao: bool = True,
):
    """All directional lights -> (H, W, 4) additive HDR contribution.
    `scan_visibility_precomputed` ((L, H, W)): visibility from a fused
    radial scan over _scan_pseudo_centers; implies the scan path.

    `shadow_mode="scan"` replaces the per-pixel cone march (fx:76-83,
    ~64 dense plane evals per light) with the gather-free column scan
    (scan_shadows.py) using far pseudo centers + the ShadowTraceLength
    cap — the same fast path sphere lights use."""
    world_pos = gbuffer.world_position()
    normal = gbuffer.normal

    direction = lights.direction[:, None, None, :]
    props = lights.properties[:, None, None, :]
    more = lights.more[:, None, None, :]
    active = lights.active[:, None, None]

    opacity = compute_directional_opacity(direction, normal[None])
    visible = (world_pos[None, ..., 0] > -9999.0) & (
        gbuffer.fullbright[None] < 0.5
    )

    if with_ao:
        ao_radius = more[..., 0] * jnp.maximum(0.0, normal[None, ..., 2])
        ao = compute_ao(volume, world_pos[None], normal[None], ao_radius,
                        more[..., 3], visible)
        opacity = opacity * ao
    # else: static skip — AO costs a full-res scene evaluation per
    # light; hosts gate it on any(ambient_occlusion_radius > 0).

    cast = props[..., 0] * gbuffer.enable_shadows[None]
    trace_enable = (
        visible
        & (cast > 0.0)
        & (opacity >= 1.0 / 256.0)
        & (direction[..., 3] >= 0.1)
        & (active > 0.0)
    )
    # Cone config (fx:78-83): radius = softness, ramp = distance falloff,
    # per-light growth factor = rampRate — folded into the ramp length
    # (growth = maxR / ramp * rate == maxR / (ramp / rate)).
    ramp = jnp.maximum(more[..., 1], 16.0) / jnp.maximum(
        props[..., 3], 1e-3
    )
    if scan_visibility_precomputed is not None:
        cone = jnp.where(
            trace_enable, scan_visibility_precomputed.astype(jnp.float32),
            1.0,
        )
    elif shadow_mode == "none":
        # Static skip when the HOST knows no light in the set casts
        # shadows — the scan and march both run their full fixed-shape
        # work even with every trace_enable false.
        cone = jnp.ones_like(opacity)
    elif shadow_mode == "scan":
        from .scan_shadows import scan_cone_visibility

        # One source of truth for the scan argument set (pseudo-centers,
        # radius, ramp, trace cap, trace plane) — the fused multi-family
        # path in scenes.py consumes the same helper.
        centers, radius, scan_ramp, mtd, trace_plane = (
            directional_scan_args(gbuffer, lights, env)
        )
        vis = scan_cone_visibility(
            volume, gbuffer, centers, radius, scan_ramp, quality,
            max_trace_distance=mtd,
            trace_z=trace_plane,
            self_occlusion_lift=SELF_OCCLUSION_HACK,
        )
        cone = jnp.where(trace_enable, vis, 1.0)
    else:
        # Fake light center behind the pixel along the direction
        # (fx:76-77).
        fake_center = (
            world_pos[None] - direction[..., :3] * props[..., 1:2]
        )
        cone = cone_trace(
            volume,
            fake_center,
            props[..., 2],
            ramp,
            world_pos[None] + SELF_OCCLUSION_HACK * normal[None],
            trace_enable,
            quality,
        )
    opacity = opacity * cone

    opacity = jnp.where(visible, opacity, 0.0) * active
    rgb = (
        lights.color[:, None, None, :3]
        * lights.color[:, None, None, 3:4]
        * opacity[..., None]
    )
    out_rgb = jnp.sum(rgb, axis=0)
    out_a = jnp.sum(opacity, axis=0)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)


# Convenience jitted alias (see scan_shadows.scan_visibility_jit): one
# whole-graph, persistent-cache-eligible compile for eager callers.
accumulate_directional_lights_jit = jax.jit(
    accumulate_directional_lights,
    static_argnames=("quality", "shadow_mode"))
