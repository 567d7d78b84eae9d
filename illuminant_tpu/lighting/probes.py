"""Light probes: scene lighting sampled at arbitrary world points.

Port of /root/reference/Illuminant/Lighting/LightingRenderer.LightProbes.cs
and LightProbe.cs: probe positions (+ optional normals, shadow flags) get
every light re-evaluated (the *LightProbe.fx techniques reuse the light
cores with the probe buffer standing in for the G-buffer). The reference
renders probes into a Px1 texture and reads it back asynchronously
(:112-150); here evaluation is a jitted function over the probe SoA and
the values stay on device until the host asks.

Zero probe normals disable directional occlusion exactly like G-buffer
pixels (LightCommon.fxh:129-131 -> computeNormalFactor returns 1).

NOTE: evaluate_probes accumulates every family ADDITIVELY; per-light
BlendMode composition (subtractive/max) is a renderer-level concept
(renderer.render_lighting groups blend passes) — callers that probe
scenes containing non-additive lights should group their light sets the
same way and compose the probe values accordingly.
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
from .directional import DirectionalLights, compute_directional_opacity
from .environment import EnvironmentUniforms, SphereLights
from .sphere import (
    SELF_OCCLUSION_HACK,
    SHADOW_OPACITY_THRESHOLD,
    compute_ao,
    compute_sphere_light_opacity,
)


@pytree_dataclass
class LightProbes:
    """SoA probe collection (LightProbe.cs:9-145)."""

    position: jnp.ndarray  # (P, 3)
    normal: jnp.ndarray  # (P, 4), .w = has-normal flag
    enable_shadows: jnp.ndarray  # (P,)
    active: jnp.ndarray  # (P,)

    @property
    def capacity(self):
        return self.position.shape[0]


@dataclasses.dataclass
class LightProbe:
    """Host probe; `value` is filled by update (LightProbe.cs:60-120)."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    normal: Optional[Tuple[float, float, float]] = None
    enable_shadows: bool = True
    value: Optional[np.ndarray] = None


def pack_probes(probes: List[LightProbe],
                capacity: Optional[int] = None) -> LightProbes:
    n = len(probes)
    cap = capacity or max(n, 1)
    pos = np.zeros((cap, 3), np.float32)
    nrm = np.zeros((cap, 4), np.float32)
    shadows = np.ones((cap,), np.float32)
    active = np.zeros((cap,), np.float32)
    for i, p in enumerate(probes):
        pos[i] = p.position
        if p.normal is not None:
            d = np.asarray(p.normal, np.float32)
            norm = np.linalg.norm(d)
            nrm[i] = [*(d / norm if norm > 0 else d), 1.0]
        shadows[i] = 1.0 if p.enable_shadows else 0.0
        active[i] = 1.0
    return LightProbes(
        position=jnp.asarray(pos),
        normal=jnp.asarray(nrm),
        enable_shadows=jnp.asarray(shadows),
        active=jnp.asarray(active),
    )


@pytree_dataclass
class ProbePoints:
    """Duck-typed G-buffer over arbitrary world points — the probe
    variants of the line/volumetric/projector cores come from evaluating
    the SAME accumulate functions over this (P, 1) 'pixel grid' (the
    reference's *LightProbe.fx techniques reuse the light cores with the
    probe buffer standing in for the G-buffer; here that sharing is
    structural)."""

    position: jnp.ndarray  # (P, 3)
    normal: jnp.ndarray  # (P, 1, 3)
    enable_shadows: jnp.ndarray  # (P, 1)
    fullbright: jnp.ndarray  # (P, 1)

    @property
    def shape(self):
        return (self.position.shape[0], 1)

    @property
    def render_scale(self):
        return 1.0

    @property
    def relative_y(self):
        return jnp.zeros((self.position.shape[0], 1), jnp.float32)

    @property
    def z(self):
        return self.position[:, 2][:, None]

    def world_position(self):
        return self.position[:, None, :]


def probe_points(probes: LightProbes) -> ProbePoints:
    normal = jnp.where(
        probes.normal[:, 3:4] > 0.5, probes.normal[:, :3], 0.0
    )
    return ProbePoints(
        position=probes.position,
        normal=normal[:, None, :],
        enable_shadows=probes.enable_shadows[:, None],
        fullbright=jnp.zeros((probes.capacity, 1), jnp.float32),
    )


def evaluate_probes(
    volume,
    probes: LightProbes,
    env: EnvironmentUniforms,
    quality: QualitySettings,
    sphere_lights: Optional[SphereLights] = None,
    directional_lights: Optional[DirectionalLights] = None,
    line_lights=None,
    volumetric_lights=None,
    projector_lights=None,
) -> jnp.ndarray:
    """-> (P, 4) HDR light values (UpdateLightProbes,
    LightProbes.cs:49-86): ambient + every light family accumulated with
    the same cores the lightmap uses."""
    pos = probes.position  # (P, 3)
    normal = jnp.where(
        probes.normal[:, 3:4] > 0.5, probes.normal[:, :3], 0.0
    )
    value = jnp.broadcast_to(env.ambient, (pos.shape[0], 4)).astype(
        jnp.float32
    )

    if sphere_lights is not None:
        lc = sphere_lights.position[:, None, :]  # (L, 1, 3)
        props = sphere_lights.properties[:, None, :]
        more = sphere_lights.more[:, None, :]
        active = sphere_lights.active[:, None]

        op = compute_sphere_light_opacity(
            pos[None], normal[None], lc, props, more[..., 2],
            env.light_occlusion,
        )  # (L, P)
        visible = op > 0.0
        ao_radius = more[..., 0] * jnp.maximum(0.0, normal[None, ..., 2])
        ao = compute_ao(volume, pos[None], normal[None], ao_radius,
                        more[..., 3], visible)
        pre = op * ao
        enable = (
            visible
            & (props[..., 3] * probes.enable_shadows[None] > 0.0)
            & (pre >= SHADOW_OPACITY_THRESHOLD)
            & (active > 0.0)
        )
        cone = cone_trace(
            volume, lc, props[..., 0], props[..., 1],
            pos[None] + SELF_OCCLUSION_HACK * normal[None], enable,
            quality,
        )
        opacity = jnp.where(visible, pre * cone, 0.0) * active
        rgb = (
            sphere_lights.color[:, None, :3]
            * sphere_lights.color[:, None, 3:4]
            * opacity[..., None]
        )
        value = value + jnp.concatenate(
            [jnp.sum(rgb, axis=0), jnp.sum(opacity, axis=0)[..., None]],
            axis=-1,
        )

    if directional_lights is not None:
        d = directional_lights.direction[:, None, :]
        props = directional_lights.properties[:, None, :]
        active = directional_lights.active[:, None]
        op = compute_directional_opacity(d, normal[None])
        enable = (
            (props[..., 0] * probes.enable_shadows[None] > 0.0)
            & (d[..., 3] >= 0.1)
            & (active > 0.0)
        )
        fake_center = pos[None] - d[..., :3] * props[..., 1:2]
        cone = cone_trace(
            volume, fake_center, props[..., 2],
            jnp.maximum(directional_lights.more[:, None, 1], 16.0)
            / jnp.maximum(props[..., 3], 1e-3),
            pos[None] + 1.5 * normal[None], enable, quality,
        )
        opacity = op * cone * active
        rgb = (
            directional_lights.color[:, None, :3]
            * directional_lights.color[:, None, 3:4]
            * opacity[..., None]
        )
        value = value + jnp.concatenate(
            [jnp.sum(rgb, axis=0), jnp.sum(opacity, axis=0)[..., None]],
            axis=-1,
        )

    if (line_lights is not None or volumetric_lights is not None
            or projector_lights is not None):
        pts = probe_points(probes)
        if line_lights is not None:
            from .line import accumulate_line_lights

            value = value + accumulate_line_lights(
                volume, pts, line_lights, env, quality
            )[:, 0, :]
        if volumetric_lights is not None:
            from .volumetric import accumulate_volumetric_lights

            value = value + accumulate_volumetric_lights(
                volume, pts, volumetric_lights, env, quality
            )[:, 0, :]
        if projector_lights is not None:
            from .projector import accumulate_projector_lights

            value = value + accumulate_projector_lights(
                volume, pts, projector_lights, env, quality
            )[:, 0, :]

    return value * probes.active[:, None]


# Convenience jitted alias (see scan_shadows.scan_visibility_jit): one
# whole-graph, persistent-cache-eligible compile for eager callers.
evaluate_probes_jit = jax.jit(
    evaluate_probes, static_argnames=("quality",))
