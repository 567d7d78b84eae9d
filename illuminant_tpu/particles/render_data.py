"""Per-particle render data: bezier color/size ramps + rotation.

Port of computeRenderData (/root/reference/Illuminant/Shaders/
UpdateCommon.fxh:97-117) and its helpers (:41-95): evaluates the system's
ColorFromLife x ColorFromVelocity and SizeFromLife x SizeFromVelocity
beziers for every live particle, premultiplies alpha, and derives rotation
from velocity direction / life / index. Runs fused into the integrator
(the reference's 4-MRT update pass).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field
from ..ops.bezier import ClampedBezier, constant_bezier, evaluate_bezier


def pack_life_ramp_settings(strength: float = 1.0, minimum: float = 0.0,
                            maximum: float = 100.0, invert: bool = False,
                            texture_height: int = 1) -> jnp.ndarray:
    """LifeRampSettings uniform (ParticleSystem.cs:926-939 upload:
    strength * (invert ? -1 : 1), minimum, max(range, 0.001),
    indexDivisor = ramp texture height)."""
    range_size = max(float(maximum) - float(minimum), 0.001)
    return jnp.asarray(
        [float(strength) * (-1.0 if invert else 1.0), float(minimum),
         range_size, float(max(texture_height, 1))],
        jnp.float32,
    )


@pytree_dataclass
class RenderDataUniforms:
    color_from_life: ClampedBezier  # 4-channel
    color_from_velocity: ClampedBezier  # 4-channel
    size_from_life: ClampedBezier  # 1-channel
    size_from_velocity: ClampedBezier  # 1-channel
    # (life_rotation, index_rotation) (UpdateCommon.fxh:18, 41-44).
    rotation_from_life_and_index: jnp.ndarray  # (2,)
    velocity_rotation: jnp.ndarray  # ()
    # ParticleColorLifeRamp (ParticleConfiguration.cs:111-137 +
    # UpdateCommon.fxh:6-16,66-80): a POINT-sampled ramp texture blended
    # over the bezier color by |strength|. U = (life - min)/range with
    # CLAMP addressing (negative strength inverts U); V = index /
    # index_divisor with WRAP addressing (per-slot ramp row). None =
    # feature off (static absence — no gather compiled).
    life_ramp: Optional[jnp.ndarray] = None  # (RH, RW, 4) f32
    life_ramp_settings: Optional[jnp.ndarray] = None  # pack_life_ramp_settings
    # Static gate for the velocity->angle path: arctan2 over every
    # particle every tick is a real cost (transcendental at 1M), and
    # most systems never rotate by velocity. Set True when building
    # uniforms for systems that do.
    use_velocity_rotation: bool = static_field(default=False)

    @staticmethod
    def defaults(size: float = 1.0) -> "RenderDataUniforms":
        return RenderDataUniforms(
            color_from_life=constant_bezier([1.0, 1.0, 1.0, 1.0]),
            color_from_velocity=constant_bezier([1.0, 1.0, 1.0, 1.0]),
            size_from_life=constant_bezier([size]),
            size_from_velocity=constant_bezier([1.0]),
            rotation_from_life_and_index=jnp.zeros((2,), jnp.float32),
            velocity_rotation=jnp.asarray(0.0, jnp.float32),
        )


def rotation_for_velocity(velocity):
    """getRotationForVelocity (UpdateCommon.fxh:82-95)."""
    absvel = jnp.abs(velocity[..., :2])
    angle = jnp.arctan2(velocity[..., 1], velocity[..., 0])
    angle = jnp.where(angle < 0.0, angle + 2.0 * jnp.pi, angle)
    near_zero = jnp.all(absvel < 0.01, axis=-1)
    return jnp.where(near_zero, 0.0, angle)


def compute_render_data(position, velocity, attributes, index,
                        u: RenderDataUniforms):
    """(N, 4) state rows -> (render_color, render_data) (N, 4) each.

    UpdateCommon.fxh:97-117. Dead particles (life <= 0) produce zeros.
    """
    life = position[..., 3]
    vel_len = jnp.maximum(
        jnp.sqrt(jnp.sum(velocity[..., :3] ** 2, axis=-1)), 1e-4
    )

    color = (
        evaluate_bezier(u.color_from_life, life)
        * evaluate_bezier(u.color_from_velocity, vel_len)
    )
    if u.life_ramp is not None:
        # getRampedColorForLifeValueAndIndex (UpdateCommon.fxh:66-80):
        # result = lerp(result, ramp(u, v) * result, sat(|strength|)).
        s = u.life_ramp_settings
        strength = s[0]
        uu = (life - s[1]) / s[2]
        uu = jnp.where(strength < 0.0,
                       1.0 - jnp.clip(uu, 0.0, 1.0), uu)
        rh, rw = u.life_ramp.shape[:2]
        # POINT sampling: U CLAMPs (life axis, texture width), V WRAPs
        # (per-index row, height) — UpdateCommon.fxh:7-13 sampler state.
        col = jnp.clip(jnp.floor(uu * rw).astype(jnp.int32), 0, rw - 1)
        row = jnp.mod(
            jnp.floor(index.astype(jnp.float32) / s[3] * rh)
            .astype(jnp.int32),
            rh,
        )
        texel = u.life_ramp[row, col]  # (N, 4) gather
        blend = jnp.clip(jnp.abs(strength), 0.0, 1.0)
        color = color + (texel * color - color) * blend
    render_color = attributes * color
    a = jnp.clip(render_color[..., 3:4], 0.0, 1.0)
    render_color = jnp.concatenate([render_color[..., :3] * a, a], axis=-1)

    size = (
        evaluate_bezier(u.size_from_life, life)[..., 0]
        * evaluate_bezier(u.size_from_velocity, vel_len)[..., 0]
    )
    rotation = (
        life * u.rotation_from_life_and_index[0]
        + index.astype(jnp.float32) * u.rotation_from_life_and_index[1]
    )
    if u.use_velocity_rotation:
        rotation = rotation + (
            rotation_for_velocity(velocity) * u.velocity_rotation
        )
    render_data = jnp.stack(
        [size, rotation, vel_len, velocity[..., 3]], axis=-1
    )

    dead = (life <= 0.0)[..., None]
    return (
        jnp.where(dead, 0.0, render_color),
        jnp.where(dead, 0.0, render_data),
    )
