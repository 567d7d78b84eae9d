"""Particle integrators: plain Euler and SDF-collision.

Ports of /root/reference/Illuminant/Shaders/UpdateParticleSystem.fx
(PS_Update :9-38) and UpdateParticleSystemWithDistanceField.fx (PS_Update
:29-147): friction/max-velocity, life decay, and for the collision variant
up to MAX_STEP_COUNT=3 sphere-trace substeps with bounce / escape /
redirect states, tetrahedral normal estimation, bounce-delay counter in
velocity.w, and the collision life penalty.

Branch-heavy GPU code becomes branchless masked selects — every particle
computes all outcomes and picks one, which is exactly how the VPU wants it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..sdf.analytic import scene_normal, scene_sample
from ..sdf.volume import SdfVolume
from ..core.pytree import named_scope
from .render_data import RenderDataUniforms, compute_render_data
from .state import ParticleState, SystemUniforms, apply_friction_and_maximum

# UpdateParticleSystemWithDistanceField.fx:12-25.
MAX_STEP_COUNT = 3
BOUNCE_DELAY = 3.0
NO_NORMAL_THRESHOLD = 0.33
ESCAPE_MASK = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
INITIAL_ESCAPE_SPEED = 0.33
ESCAPE_SPEED_ACCELERATION = 1.1


def _norm(v, eps=1e-12):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), eps))


def _unit(v, eps=1e-12):
    return v / _norm(v, eps)[..., None]


def integrate(state: ParticleState, su: SystemUniforms,
              rd: RenderDataUniforms) -> ParticleState:
    """Plain Euler (UpdateParticleSystem.fx PS_Update)."""
    pos = state.position
    vel = state.velocity
    dt = su.dt

    velocity = apply_friction_and_maximum(vel[:, :3], su)
    new_life = pos[:, 3] - su.life_decay * dt
    alive = new_life > 0.0

    new_pos = jnp.concatenate(
        [pos[:, :3] + velocity * dt, new_life[:, None]], axis=-1
    )
    new_vel = jnp.concatenate([velocity, vel[:, 3:4]], axis=-1)

    was_alive = pos[:, 3] > 0.0
    keep = (alive & was_alive)[:, None]
    new_pos = jnp.where(keep, new_pos, jnp.where(was_alive[:, None], 0.0,
                                                 pos))
    new_vel = jnp.where(keep, new_vel, jnp.where(was_alive[:, None], 0.0,
                                                 vel))

    index = jnp.arange(state.capacity, dtype=jnp.int32)
    render_color, render_data = compute_render_data(
        new_pos, new_vel, state.color, index, rd
    )
    return state.replace(
        position=new_pos,
        velocity=new_vel,
        render_color=render_color,
        render_data=render_data,
    )


@named_scope("illuminant/particle_integrate")
def integrate_with_distance_field(
    state: ParticleState,
    su: SystemUniforms,
    rd: RenderDataUniforms,
    volume,
    maximum_z: float | jnp.ndarray = 1e9,
) -> ParticleState:
    """SDF collision integrate (UpdateParticleSystemWithDistanceField.fx).

    `maximum_z` mirrors ParticleCollision.DistanceFieldMaximumZ
    (ParticleConfiguration.cs:8-40): particles above it ignore the field.
    """
    pos = state.position
    vel = state.velocity
    dt = su.dt
    collision_distance = su.collision_settings[2]
    escape_velocity = su.collision_settings[0]
    bounce_mult = su.collision_settings[1]
    life_penalty = su.collision_settings[3]

    old_xyz = pos[:, :3]
    new_life = pos[:, 3] - su.life_decay * dt
    was_alive = pos[:, 3] > 0.0
    alive = (new_life > 0.0) & was_alive

    unit_vector = _unit(vel[:, :3])
    velocity = apply_friction_and_maximum(vel[:, :3], su)
    scaled_velocity = velocity * dt

    # fx:63-70.
    initial_distance = scene_sample(volume, old_xyz)
    above_field = old_xyz[:, 2] > maximum_z
    initial_distance = jnp.where(above_field, 1e9, initial_distance)
    was_colliding = initial_distance < collision_distance
    travel = jnp.maximum(
        0.0, jnp.minimum(initial_distance, _norm(scaled_velocity))
    )

    collided = jnp.zeros_like(was_colliding)
    escaping = jnp.zeros_like(was_colliding)
    collision_pos = jnp.zeros_like(old_xyz)
    # Active substep mask (fx:66-71): wasColliding -> 1 step; zero travel
    # -> 0 steps.
    steps_left = jnp.where(
        was_colliding, 1, jnp.where(travel <= 0.001, 0, MAX_STEP_COUNT)
    )

    for _ in range(MAX_STEP_COUNT):  # fx:72-90, statically unrolled
        active = steps_left > 0
        test_pos = old_xyz + travel[:, None] * unit_vector
        step_distance = scene_sample(volume, test_pos)
        step_distance = jnp.where(above_field, 1e9, step_distance)
        hit = step_distance < collision_distance

        collided = jnp.where(active & hit, True, collided)
        collision_pos = jnp.where(
            (active & hit)[:, None], test_pos, collision_pos
        )
        escaping = jnp.where(active, step_distance > initial_distance,
                             escaping)

        backtrack = active & collided & ~escaping
        collision_pos = jnp.where(backtrack[:, None], test_pos,
                                  collision_pos)
        offset = jnp.clip(step_distance + collision_distance, 0.05, 16.0)
        travel = jnp.where(backtrack, jnp.maximum(0.0, travel - offset),
                           travel)

        # stepCount = 0 when not backtracking or travel exhausted (fx:85-89).
        steps_left = jnp.where(
            active & backtrack & (travel > 0.001), steps_left - 1, 0
        )

    # fx:92-139: resolve collision outcomes.
    bounce = vel[:, 3] <= 0.0
    redirect = was_colliding & ~escaping
    needs_normal = collided & (bounce | redirect)
    normal = jnp.where(
        needs_normal[:, None], scene_normal(volume, collision_pos), 0.0
    )
    escape_speed = jnp.minimum(su.maximum_velocity, escape_velocity)

    # Redirect: flee along the (xy-masked) normal (fx:103-116).
    r_normal = normal * ESCAPE_MASK
    r_len = _norm(r_normal)
    # Position-hash fallback direction to escape volume centers (fx:105-110)
    # — keyed on the slot index here instead of pixel xy.
    slot = jnp.arange(pos.shape[0], dtype=jnp.float32)
    hash_angle = (slot % 67.0) / 67.0 * 6.2831853 + (slot % 13.0) / 13.0
    fallback = jnp.stack(
        [jnp.sin(hash_angle), jnp.cos(hash_angle),
         jnp.zeros_like(hash_angle)], axis=-1,
    )
    r_dir = jnp.where(
        (r_len < NO_NORMAL_THRESHOLD)[:, None], fallback, r_normal
    )
    r_vel3 = _unit(r_dir) * (escape_speed * INITIAL_ESCAPE_SPEED)
    r_pos = old_xyz + r_vel3 * dt

    # Bounce: reflect (fx:117-128).
    ndotu = jnp.sum(normal * unit_vector, axis=-1, keepdims=True)
    bounce_vec = -(2.0 * ndotu * (normal - unit_vector))
    b_len = _norm(bounce_vec)
    bounce_dir = jnp.where(
        (b_len < NO_NORMAL_THRESHOLD)[:, None], -unit_vector,
        _unit(bounce_vec),
    )
    b_speed = jnp.minimum(
        su.maximum_velocity, _norm(velocity) * bounce_mult
    )
    b_vel3 = bounce_dir * b_speed[:, None]
    b_pos = collision_pos

    # Escaping while colliding: accelerate out (fx:129-135).
    cur_speed = _norm(vel[:, :3])
    e_speed = jnp.maximum(cur_speed * ESCAPE_SPEED_ACCELERATION,
                          escape_speed)
    e_vel3 = unit_vector * e_speed[:, None]
    e_pos = old_xyz + travel[:, None] * unit_vector

    # No collision (fx:136-139).
    n_vel3 = velocity
    n_pos = old_xyz + travel[:, None] * unit_vector
    n_w = jnp.maximum(vel[:, 3] - 1.0, 0.0)

    sel_redirect = (collided & redirect)[:, None]
    sel_bounce = (collided & ~redirect & bounce)[:, None]
    sel_escape = (collided & ~redirect & ~bounce)[:, None]

    out_vel3 = jnp.where(
        sel_redirect, r_vel3,
        jnp.where(sel_bounce, b_vel3, jnp.where(sel_escape, e_vel3, n_vel3)),
    )
    out_pos3 = jnp.where(
        sel_redirect, r_pos,
        jnp.where(sel_bounce, b_pos, jnp.where(sel_escape, e_pos, n_pos)),
    )
    out_w = jnp.where(
        collided & (redirect | bounce), BOUNCE_DELAY,
        jnp.where(collided, vel[:, 3], n_w),
    )
    new_life = jnp.where(collided & ~redirect & bounce,
                         new_life - life_penalty, new_life)

    alive = alive & (new_life > 0.0)
    keep = alive[:, None]
    new_pos = jnp.where(
        keep,
        jnp.concatenate([out_pos3, new_life[:, None]], axis=-1),
        jnp.where(was_alive[:, None], 0.0, pos),
    )
    new_vel = jnp.where(
        keep,
        jnp.concatenate([out_vel3, out_w[:, None]], axis=-1),
        jnp.where(was_alive[:, None], 0.0, vel),
    )

    index = jnp.arange(state.capacity, dtype=jnp.int32)
    render_color, render_data = compute_render_data(
        new_pos, new_vel, state.color, index, rd
    )
    return state.replace(
        position=new_pos,
        velocity=new_vel,
        render_color=render_color,
        render_data=render_data,
    )
