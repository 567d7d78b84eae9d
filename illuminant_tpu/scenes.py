"""Benchmark / flagship scene builders.

The "flagship" scene is the BASELINE.md config-5 shape: multi-light SDF
lighting at a given resolution plus a large particle system with gravity +
SDF collision, all advanced by ONE jitted frame function (lightmap render +
particle tick fused into a single XLA program).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .core.config import QualitySettings, RendererConfig
from .lighting import gbuffer as gbuf
from .lighting.environment import (
    LightObstruction,
    LightingEnvironment,
    SphereLightSource,
    pack_sphere_lights,
)
from .lighting.sphere import accumulate_sphere_lights
from .ops import sdf_primitives as sp
from .particles.formula import FORMULA_SPHERICAL, Formula1, Formula3, Formula4
from .particles.integrate import integrate_with_distance_field
from .particles.render_data import RenderDataUniforms
from .particles.spawner import Spawner, spawn as spawn_fn
from .particles.state import ParticleState
from .particles.system import ParticleSystem, ParticleSystemConfig
from .particles import transforms as tx
from .sdf import analytic, volume as vol


@dataclasses.dataclass
class FlagshipScene:
    config: RendererConfig
    environment: LightingEnvironment
    sdf_config: vol.SdfVolumeConfig
    volume: object  # AnalyticScene (TPU-native) or SdfVolume
    gbuffer: object
    sphere_lights: object
    system: ParticleSystem
    frame: object  # jitted (state, key, ...) -> (lightmap, state)
    frame_loop: object  # jitted n-frames-per-dispatch variant
    spawner: Spawner


def build_flagship(
    height: int = 1080,
    width: int = 1920,
    n_lights: int = 8,
    capacity: int = 1 << 20,
    spawn_max: int = 16384,
    sdf_resolution_scale: float = 0.25,
    quality: Optional[QualitySettings] = None,
) -> FlagshipScene:
    """Multi-light + occluders + big particle system, one fused frame."""
    env = LightingEnvironment(
        ground_z=0.0, maximum_z=128.0, ambient=(0.03, 0.03, 0.04, 1.0)
    )
    # Lights on a ring.
    import math

    cx, cy = width * 0.5, height * 0.5
    ring = min(width, height) * 0.38
    colors = [
        (1.0, 0.5, 0.3, 1.0), (0.3, 1.0, 0.5, 1.0), (0.4, 0.5, 1.0, 1.0),
        (1.0, 0.9, 0.4, 1.0), (0.9, 0.3, 0.9, 1.0), (0.3, 0.9, 0.9, 1.0),
        (1.0, 0.7, 0.7, 1.0), (0.7, 1.0, 0.7, 1.0),
    ]
    for i in range(n_lights):
        a = 2 * math.pi * i / n_lights
        env.lights.append(
            SphereLightSource(
                position=(cx + ring * math.cos(a), cy + ring * math.sin(a),
                          40.0),
                radius=12.0,
                ramp_length=max(width, height) * 0.45,
                color=colors[i % len(colors)],
            )
        )
    # Occluders.
    env.obstructions += [
        LightObstruction.box((cx, cy, 24.0), (22.0, 22.0, 24.0)),
        LightObstruction.ellipsoid((cx - ring * 0.5, cy, 20.0),
                                   (28.0, 16.0, 20.0)),
        LightObstruction.cylinder((cx, cy - ring * 0.5, 26.0),
                                  (12.0, 12.0, 26.0)),
        LightObstruction.box((cx + ring * 0.45, cy + ring * 0.3, 16.0),
                             (30.0, 10.0, 16.0)),
    ]

    config = RendererConfig(
        width=width, height=height,
        # Flagship quality: half-res shadows, no 3D refinement — this
        # scene's obstructions are tall relative to the trace plane, so
        # the flatland scan is already accurate for it (the library
        # default is scan_refine_samples=2; each sample costs ~2.5 ms at
        # 1080p x 8 lights — see PERF.md).
        quality=quality or QualitySettings(shadow_scale=0.5,
                                           scan_refine_samples=0),
    )
    sdf_config = vol.SdfVolumeConfig(
        virtual_width=width,
        virtual_height=height,
        virtual_depth=64,
        slice_count=16,
        resolution_scale=sdf_resolution_scale,
    )
    # The analytic scene is the TPU-native field (sdf/analytic.py) — no
    # voxel gathers anywhere in the frame.
    volume = analytic.pack_scene(env.obstructions)
    env_u = env.uniforms()
    gbuffer = gbuf.flat_ground(height, width, env_u)
    sphere_lights = pack_sphere_lights(
        [l for l in env.lights if isinstance(l, SphereLightSource)],
        capacity=max(n_lights, 1),
    )

    # Particle system: spawner + gravity + SDF collision.
    p_config = ParticleSystemConfig(
        capacity=capacity,
        updates_per_second=0.0,
        life_decay_per_second=0.2,
        friction=0.1,
        maximum_velocity=600.0,
        collision_distance=1.0,
        bounce_velocity_multiplier=0.7,
    )
    spawner = Spawner(
        min_rate=float(capacity) * 0.2,  # refill ~20%/s
        max_rate=float(capacity) * 0.2,
        life=Formula1(constant=4.0, random_scale=1.0, offset=-0.5),
        position=Formula3(constant=(cx, cy, 30.0),
                          offset=(ring * 0.8, ring * 0.8, 8.0),
                          random_scale=(40.0, 40.0, 4.0),
                          type=FORMULA_SPHERICAL),
        velocity=Formula3(random_scale=(90.0, 90.0, 10.0),
                          type=FORMULA_SPHERICAL),
        color=Formula4(constant=(0.4, 0.5, 0.9, 0.5),
                       random_scale=(0.4, 0.3, 0.1, 0.3)),
        spawn_max=spawn_max,
    )
    grav = tx.Gravity(attractors=[
        tx.Attractor(position=(cx, cy, 20.0), radius=float(max(width,
                                                               height)),
                     strength=150.0, falloff_type=tx.FALLOFF_LINEAR),
    ], maximum_acceleration=3000.0)
    system = ParticleSystem(p_config, [spawner, grav], volume=volume)

    su = system.system_uniforms(1.0 / 60.0)
    rd = system.render_data
    grav_u = grav.uniforms(0.0)
    spawn_u = spawner.uniforms(0.0)

    def _frame_body(i, state, key, volume_, gbuffer_, lights_, env_u_,
                    spawn_count):
        # Animate light positions (orbit around the scene center) — the
        # realistic dynamic workload, and it keeps the lighting inside any
        # multi-frame loop (nothing is loop-invariant).
        ang = i.astype(jnp.float32) * 0.01
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        center = jnp.asarray([cx, cy, 0.0], jnp.float32)
        rel = lights_.position - center
        rot = jnp.stack(
            [rel[:, 0] * ca - rel[:, 1] * sa,
             rel[:, 0] * sa + rel[:, 1] * ca,
             rel[:, 2]],
            axis=-1,
        )
        lights_i = lights_.replace(position=center + rot)

        lightmap = jnp.broadcast_to(
            env_u_.ambient, (gbuffer_.z.shape[0], gbuffer_.z.shape[1], 4)
        ).astype(jnp.float32)
        lightmap = lightmap + accumulate_sphere_lights(
            volume_, gbuffer_, lights_i, env_u_, config.quality,
            with_specular=False, shadow_mode="scan", with_ao=False,
        )
        k = jax.random.fold_in(key, i)
        state = spawn_fn(state, spawn_u, spawn_count, k,
                         spawner.spawn_max)
        pos, vel = tx.apply_gravity(state.position, state.velocity, grav_u,
                                    su)
        state = state.replace(position=pos, velocity=vel)
        state = integrate_with_distance_field(state, su, rd, volume_)
        return lightmap, state

    @partial(jax.jit, donate_argnums=(0,))
    def frame(state: ParticleState, key, volume_, gbuffer_, lights_,
              env_u_, spawn_count):
        return _frame_body(jnp.asarray(0, jnp.int32), state, key, volume_,
                           gbuffer_, lights_, env_u_, spawn_count)

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("n_frames",))
    def frame_loop(state: ParticleState, key, volume_, gbuffer_, lights_,
                   env_u_, spawn_count, i0, n_frames: int):
        """n_frames full frames in ONE dispatch — amortizes host-tunnel
        latency so benchmarks measure device throughput."""
        h, w = gbuffer_.z.shape

        def body(j, carry):
            state, _ = carry
            lightmap, state = _frame_body(
                i0 + j, state, key, volume_, gbuffer_, lights_, env_u_,
                spawn_count,
            )
            return state, lightmap

        state, lightmap = jax.lax.fori_loop(
            0, n_frames, body,
            (state, jnp.zeros((h, w, 4), jnp.float32)),
        )
        return lightmap, state

    return FlagshipScene(
        config=config,
        environment=env,
        sdf_config=sdf_config,
        volume=volume,
        gbuffer=gbuffer,
        sphere_lights=sphere_lights,
        system=system,
        frame=frame,
        frame_loop=frame_loop,
        spawner=spawner,
    )
