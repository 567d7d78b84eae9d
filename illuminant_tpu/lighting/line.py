"""Line lights.

Port of /root/reference/Illuminant/Shaders/LineLight.fx +
LineLightCore.fxh + FBPBR.fxh:53-101 (LineLightSource,
Lighting/LightSource.cs:313-371): a segment light with Frostbite-style
area-light illuminance (rectangle solid angle + sphere term at the closest
point), colors lerped start->end by the closest-point parameter u
(LineLight.fx:40), and a 3-ray cone trace at u-offset/u/u+offset whose raw
visibilities average before thresholding (LineLightCore.fxh:17-68).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import QualitySettings
from ..core.pytree import pytree_dataclass
from .cone_trace import (
    FULLY_SHADOWED_THRESHOLD,
    UNSHADOWED_THRESHOLD,
    cone_trace,
)
from .environment import EnvironmentUniforms
from .gbuffer import GBuffer
from .sphere import compute_ao

SELF_OCCLUSION_HACK = 1.5  # LineLightCore.fxh:10
SHADOW_OPACITY_THRESHOLD = 0.75 / 255.0


@pytree_dataclass
class LineLights:
    start: jnp.ndarray  # (L, 3)
    end: jnp.ndarray  # (L, 3)
    color_start: jnp.ndarray  # (L, 4)
    color_end: jnp.ndarray  # (L, 4)
    properties: jnp.ndarray  # (L, 4) radius, ramp_length, mode, shadows
    more: jnp.ndarray  # (L, 4) ao_radius, falloff, y_factor, ao_opacity
    active: jnp.ndarray  # (L,)

    @property
    def capacity(self):
        return self.start.shape[0]


@dataclasses.dataclass
class LineLightSource:
    """Host (LightSource.cs:313-371)."""

    start: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    end: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    radius: float = 1.0
    color_start: tuple = (1.0, 1.0, 1.0, 1.0)
    color_end: Optional[tuple] = None
    opacity: float = 1.0
    cast_shadows: bool = True
    ambient_occlusion_radius: float = 0.0
    ambient_occlusion_opacity: float = 1.0
    # LightSource.BlendMode (LightSource.cs:65).
    blend_mode: str = "additive"


def pack_line_lights(lights: List[LineLightSource],
                     capacity: Optional[int] = None) -> LineLights:
    n = len(lights)
    cap = capacity or max(n, 1)
    start = np.zeros((cap, 3), np.float32)
    end = np.ones((cap, 3), np.float32)
    cs = np.zeros((cap, 4), np.float32)
    ce = np.zeros((cap, 4), np.float32)
    props = np.zeros((cap, 4), np.float32)
    more = np.zeros((cap, 4), np.float32)
    more[:, 2] = 1.0
    more[:, 3] = 1.0
    active = np.zeros((cap,), np.float32)
    for i, l in enumerate(lights):
        start[i] = l.start
        end[i] = l.end
        a = np.asarray(l.color_start, np.float32).copy()
        a[3] *= l.opacity
        b = np.asarray(l.color_end if l.color_end is not None
                       else l.color_start, np.float32).copy()
        b[3] *= l.opacity
        cs[i] = a
        ce[i] = b
        props[i] = [l.radius, 1.0, 0.0, 1.0 if l.cast_shadows else 0.0]
        more[i] = [l.ambient_occlusion_radius, 0.0, 1.0,
                   l.ambient_occlusion_opacity]
        active[i] = 1.0
    return LineLights(
        start=jnp.asarray(start), end=jnp.asarray(end),
        color_start=jnp.asarray(cs), color_end=jnp.asarray(ce),
        properties=jnp.asarray(props), more=jnp.asarray(more),
        active=jnp.asarray(active),
    )


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _norm(v, eps=1e-12):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), eps))


def _unit(v):
    return v / _norm(v)[..., None]


def closest_point_on_segment(p0, p1, point):
    """-> (closest (..., 3), u (...,)) clamped to [0, 1]."""
    d = p1 - p0
    len_sq = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
    u = _saturate(jnp.sum((point - p0) * d, axis=-1) / len_sq)
    return p0 + u[..., None] * d, u


def rectangle_solid_angle(world, p0, p1, p2, p3):
    """FBPBR.fxh:33-51."""
    v0 = p0 - world
    v1 = p1 - world
    v2 = p2 - world
    v3 = p3 - world
    n0 = _unit(jnp.cross(v0, v1))
    n1 = _unit(jnp.cross(v1, v2))
    n2 = _unit(jnp.cross(v2, v3))
    n3 = _unit(jnp.cross(v3, v0))

    def g(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(-a * b, axis=-1), -1.0, 1.0))

    return g(n0, n1) + g(n1, n2) + g(n2, n3) + g(n3, n0) - 2.0 * jnp.pi


def compute_line_light_opacity(world, normal, p0, p1, radius):
    """computeLineLightOpacity (FBPBR.fxh:53-101) -> (opacity, center, u)."""
    light_left = _unit(p1 - p0)
    light_center = (p0 + p1) * 0.5

    sphere_pos, u = closest_point_on_segment(p0, p1, world)
    forward = _unit(sphere_pos - world)
    up = jnp.cross(light_left, forward)
    r = radius[..., None]
    q0 = p0 + r * up
    q1 = p0 - r * up
    q2 = p1 - r * up
    q3 = p1 + r * up
    solid_angle = rectangle_solid_angle(world, q0, q1, q2, q3)

    def sdot(p):
        return _saturate(jnp.sum(_unit(p - world) * normal, axis=-1))

    illuminance = solid_angle * 0.2 * (
        sdot(q0) + sdot(q1) + sdot(q2) + sdot(q3) + sdot(light_center)
    )
    sphere_un = sphere_pos - world
    sq_dist = jnp.maximum(jnp.sum(sphere_un * sphere_un, axis=-1), 1e-9)
    ill_sphere = (
        jnp.pi
        * _saturate(jnp.sum(_unit(sphere_un) * normal, axis=-1))
        * (radius * radius / sq_dist)
    )
    return _saturate(illuminance + ill_sphere), sphere_pos, u


def line_scan_anchors(lights: LineLights):
    """Segment anchors as radial-scan centers: (3L, 3) positions (start,
    midpoint, end — anchor-major), with tiled radii/ramps. Shared by the
    in-family scan branch and fused multi-family scans (scenes.py)."""
    anchors = jnp.concatenate(
        [lights.start, (lights.start + lights.end) * 0.5, lights.end],
        axis=0,
    )
    rad3 = jnp.tile(lights.properties[:, 0], 3)
    ramp3 = jnp.tile(lights.properties[:, 1], 3)
    return anchors, rad3, ramp3


def accumulate_line_lights(
    volume,
    gbuffer: GBuffer,
    lights: LineLights,
    env: EnvironmentUniforms,
    quality: QualitySettings,
    shadow_mode: str = "march",
    scan_visibility_precomputed=None,
    with_ao: bool = True,
):
    """All line lights -> (H, W, 4) additive HDR contribution.

    `scan_visibility_precomputed` ((3L, H, W), anchor-major like
    line_scan_anchors' order): per-anchor visibilities from a caller's
    fused radial scan; implies the scan path.

    `shadow_mode="scan"` approximates the 3-ray march
    (LineLightCore.fxh:27-34) with three radial scans anchored at the
    segment start / midpoint / end, blended per pixel by the
    closest-point parameter u (hat weights). Deviation vs the march:
    the reference averages RAW ray visibilities around the per-pixel
    closest point before thresholding; the scan blends the THRESHOLDED
    visibilities of the three fixed anchors — penumbrae along the
    segment direction interpolate instead of tracking u exactly."""
    world_pos = gbuffer.world_position()
    normal = gbuffer.normal

    p0 = lights.start[:, None, None, :]
    p1 = lights.end[:, None, None, :]
    props = lights.properties[:, None, None, :]
    more = lights.more[:, None, None, :]
    active = lights.active[:, None, None]
    radius = props[..., 0]

    opacity, _, u = compute_line_light_opacity(
        world_pos[None], normal[None], p0, p1, radius
    )
    visible = (
        (opacity > 0.0)
        & (world_pos[None, ..., 0] > -9999.0)
        & (gbuffer.fullbright[None] < 0.5)
    )

    if with_ao:
        ao_radius = more[..., 0] * jnp.maximum(0.0, normal[None, ..., 2])
        ao = compute_ao(volume, world_pos[None], normal[None], ao_radius,
                        more[..., 3], visible)
        pre_trace = opacity * ao
    else:
        # Static skip: AO costs a full-res scene evaluation per light;
        # hosts gate it on any(light.ambient_occlusion_radius > 0)
        # (same contract as accumulate_sphere_lights).
        pre_trace = opacity

    cast = props[..., 3] * gbuffer.enable_shadows[None]
    trace_enable = (
        visible & (cast > 0.0)
        & (pre_trace >= SHADOW_OPACITY_THRESHOLD) & (active > 0.0)
    )
    shaded = world_pos[None] + SELF_OCCLUSION_HACK * normal[None]

    if shadow_mode == "none" and scan_visibility_precomputed is None:
        # Static skip when the HOST knows no light in the set casts
        # shadows — the scan and march both run their full fixed-shape
        # work even with every trace_enable false. Caller-supplied
        # visibility takes PRECEDENCE (same order as sphere.py /
        # directional.py — the docstring's 'implies the scan path').
        cone = jnp.ones_like(pre_trace)
    elif shadow_mode == "scan" or scan_visibility_precomputed is not None:
        if scan_visibility_precomputed is not None:
            vis3 = scan_visibility_precomputed.astype(jnp.float32)
        else:
            from .scan_shadows import scan_cone_visibility

            anchors, rad3, ramp3 = line_scan_anchors(lights)
            vis3 = scan_cone_visibility(
                volume, gbuffer, anchors, rad3, ramp3, quality,
                self_occlusion_lift=SELF_OCCLUSION_HACK,
                light_active=jnp.tile(lights.active, 3),
            )
        vis3 = vis3.reshape(3, lights.capacity, *vis3.shape[1:])
        # Hat weights over u: anchor 0 at u=0, 1 at u=0.5, 2 at u=1.
        w0 = _saturate(1.0 - 2.0 * u)
        w2 = _saturate(2.0 * u - 1.0)
        w1 = 1.0 - w0 - w2
        vis = (w0 * vis3[0] + w1 * vis3[1] + w2 * vis3[2]).astype(
            jnp.float32
        )
        cone = jnp.where(trace_enable, vis, 1.0)
    else:
        # 3-ray trace at u - offset / u / u + offset
        # (LineLightCore.fxh:27-34), raw visibilities averaged before
        # thresholding (:52-57).
        delta = p1 - p0
        delta_len = _norm(delta)
        offset = jnp.maximum(
            _saturate((radius + 1.0) / jnp.maximum(delta_len, 1e-6)), 0.03
        )
        raws = []
        for du in (-1.0, 0.0, 1.0):
            uu = _saturate(u + du * offset)
            target = p0 + uu[..., None] * delta
            raws.append(
                cone_trace(volume, target, radius, props[..., 1], shaded,
                           trace_enable, quality, raw=True)
            )
        visibility = (raws[0] + raws[1] + raws[2]) / 3.0
        cone = (
            _saturate(
                _saturate(visibility - FULLY_SHADOWED_THRESHOLD)
                / (UNSHADOWED_THRESHOLD - FULLY_SHADOWED_THRESHOLD)
            )
            ** quality.occlusion_to_opacity_power
        )
        cone = jnp.where(trace_enable, cone, 1.0)

    light_opacity = jnp.where(visible, pre_trace * cone, 0.0) * active
    color = (
        lights.color_start[:, None, None, :]
        + (lights.color_end - lights.color_start)[:, None, None, :]
        * u[..., None]
    )
    rgb = color[..., :3] * color[..., 3:4] * light_opacity[..., None]
    out_rgb = jnp.sum(rgb, axis=0)
    out_a = jnp.sum(light_opacity, axis=0)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)


# Convenience jitted alias (see scan_shadows.scan_visibility_jit): one
# whole-graph, persistent-cache-eligible compile for eager callers.
accumulate_line_lights_jit = jax.jit(
    accumulate_line_lights,
    static_argnames=("quality", "shadow_mode"))
