"""Particle lights: a sphere-light template applied per live particle.

Port of /root/reference/Illuminant/Shaders/ParticleLight.fx and
ParticleLightSource (Lighting/LightSource.cs:466-505): each live particle
becomes an instance of the template sphere light, its color = particle
attribute color (un-premultiplied) x template color (fx:40-71), with
StippleFactor thinning the set (fx:27).

TPU design: instead of instancing one quad per particle, a strided subset
of at most `max_lights` slots is taken from the particle SoA (static
slicing — no gathers) and evaluated as a batched SphereLights set through
the standard accumulator. The stipple factor maps to the subset fraction,
and brightness is compensated by the sampling ratio so total emitted light
energy is preserved (the reference's stipple does the same visually by
drawing a fraction of instances at full brightness — we normalize instead
so sparse sampling does not flicker).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.config import QualitySettings
from ..particles.state import ParticleState
from .environment import EnvironmentUniforms, SphereLights, SphereLightSource
from .gbuffer import GBuffer
from .sphere import accumulate_sphere_lights


@dataclasses.dataclass
class ParticleLightSource:
    """Host (LightSource.cs:466-505)."""

    template: SphereLightSource = dataclasses.field(
        default_factory=SphereLightSource
    )
    stipple_factor: float = 1.0
    max_lights: int = 64  # static evaluation budget


def subset_lights_from_particles(
    state: ParticleState,
    template: SphereLightSource,
    max_lights: int,
    energy_compensate: bool = True,
    stipple_factor: float = 1.0,
) -> SphereLights:
    """Strided subset of particle slots -> SphereLights SoA.

    `stipple_factor` thins the subset further (LightSource.cs:466+
    StippleFactor), with brightness compensation preserving total
    emitted energy."""
    n = state.capacity
    stride = max(n // max_lights, 1)
    pos = state.position[::stride][:max_lights]
    col = state.color[::stride][:max_lights]
    count = pos.shape[0]

    live = pos[:, 3] > 0.0
    alpha_ok = col[:, 3] > 0.0
    if stipple_factor < 1.0:
        from ..ops.coords import stipple_keep

        live = live & stipple_keep(count, stipple_factor)
    active = (live & alpha_ok).astype(jnp.float32)

    t_color = jnp.asarray(template.color, jnp.float32)
    # Un-premultiplied attribute color x template (ParticleLight.fx:40-71).
    color = col * t_color
    scale = float(stride) if energy_compensate else 1.0
    if energy_compensate and stipple_factor < 1.0:
        scale /= max(stipple_factor, 1e-3)
    color = jnp.concatenate(
        [color[:, :3], color[:, 3:4] * (template.opacity * scale)],
        axis=-1,
    )

    base = SphereLights.empty(count)
    props = jnp.broadcast_to(
        jnp.asarray(
            [
                template.radius,
                template.ramp_length,
                float(template.ramp_mode),
                1.0 if template.cast_shadows else 0.0,
            ],
            jnp.float32,
        ),
        (count, 4),
    )
    more = jnp.broadcast_to(
        jnp.asarray(
            [
                template.ambient_occlusion_radius,
                0.0,
                max(template.falloff_y_factor, 1e-3),
                template.ambient_occlusion_opacity,
            ],
            jnp.float32,
        ),
        (count, 4),
    )
    return base.replace(
        position=pos[:, :3],
        color=color,
        properties=props,
        more=more,
        active=active,
    )


def accumulate_particle_lights(
    volume,
    gbuffer: GBuffer,
    state: ParticleState,
    source: ParticleLightSource,
    env: EnvironmentUniforms,
    quality: QualitySettings,
    shadow_mode: str = "scan",
):
    """-> (H, W, 4) additive HDR contribution.

    Uses previous-frame particle state by convention (the reference reads
    usePreviousData to avoid a pipeline stall, LightingRenderer.cs:1138-43;
    functionally pass whichever state you have)."""
    lights = subset_lights_from_particles(
        state, source.template, source.max_lights,
        stipple_factor=source.stipple_factor,
    )
    if not source.template.cast_shadows:
        # Host-static skip: the scan/march run full fixed-shape work even
        # when every per-light cast flag is false.
        shadow_mode = "none"
    return accumulate_sphere_lights(
        volume, gbuffer, lights, env, quality,
        with_specular=False, shadow_mode=shadow_mode,
        with_ao=source.template.ambient_occlusion_radius > 0.0,
    )


# Convenience jitted alias (see scan_shadows.scan_visibility_jit): one
# whole-graph, persistent-cache-eligible compile for eager callers.
# ParticleLightSource is a host-side mutable config (not a pytree), so
# the wrapper freezes it into a hashable static key per call.
def _rebuild_source(key) -> ParticleLightSource:
    tpl_vals, stipple, max_lights = key
    return ParticleLightSource(
        template=SphereLightSource(*tpl_vals),
        stipple_factor=stipple, max_lights=max_lights,
    )


def _apl_keyed_py(volume, gbuffer, state, env, quality, source_key,
                  shadow_mode):
    return accumulate_particle_lights(
        volume, gbuffer, state, _rebuild_source(source_key), env,
        quality, shadow_mode,
    )


_apl_keyed = jax.jit(
    _apl_keyed_py,
    static_argnames=("quality", "source_key", "shadow_mode"),
)


def accumulate_particle_lights_jit(volume, gbuffer, state,
                                   source: ParticleLightSource, env,
                                   quality, shadow_mode="scan"):
    tpl = source.template
    if tpl.ramp_texture is not None:  # array field -> not freezable
        return accumulate_particle_lights(
            volume, gbuffer, state, source, env, quality, shadow_mode)
    key = (dataclasses.astuple(tpl), source.stipple_factor,
           source.max_lights)
    return _apl_keyed(volume, gbuffer, state, env, quality=quality,
                      source_key=key, shadow_mode=shadow_mode)
