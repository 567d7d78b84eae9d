"""Whole-frame cost breakdown: frame_loop with stages toggled.

Measures the ACTUAL fused frame (as bench.py runs it) and variants with
lighting / particles / animation disabled, to locate cost that the
stage-isolation profile misses (fusion boundaries, carry copies, layout
transitions).

Usage: python tools/profile_frame2.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, CAP = 1080, 1920, 1 << 20
FRAMES = 200


def fence(x):
    x = x.reshape(-1)
    return float(jnp.max(x[:: max(1, int(x.shape[0]) // 997 * 2 + 1)]))


def main():
    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.lighting.sphere import accumulate_sphere_lights
    from illuminant_tpu.particles.spawner import spawn as spawn_fn
    from illuminant_tpu.particles import transforms as tx
    from illuminant_tpu.particles.integrate import (
        integrate_with_distance_field)

    scene = build_flagship(height=H, width=W, capacity=CAP)
    volume = scene.volume
    gb = scene.gbuffer
    lights = scene.sphere_lights
    env_u = scene.environment.uniforms()
    config = scene.config
    system = scene.system
    su = system.system_uniforms(1.0 / 60.0)
    rd = system.render_data
    grav = scene.system.transforms[1]
    grav_u = grav.uniforms(0.0)
    spawn_u = scene.spawner.uniforms(0.0)
    spawn_count = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
    key = jax.random.key(0)
    state0 = system.state

    cx, cy = W * 0.5, H * 0.5

    def light_anim(i, lights_):
        ang = i.astype(jnp.float32) * 0.01
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        center = jnp.asarray([cx, cy, 0.0], jnp.float32)
        rel = lights_.position - center
        rot = jnp.stack(
            [rel[:, 0] * ca - rel[:, 1] * sa,
             rel[:, 0] * sa + rel[:, 1] * ca, rel[:, 2]], axis=-1)
        return lights_.replace(position=center + rot)

    def particles_step(i, state):
        k = jax.random.fold_in(key, i)
        state = spawn_fn(state, spawn_u, spawn_count, k,
                         scene.spawner.spawn_max)
        pos, vel = tx.apply_gravity(state.position, state.velocity, grav_u,
                                    su)
        state = state.replace(position=pos, velocity=vel)
        return integrate_with_distance_field(state, su, rd, volume)

    def lighting(i, do_anim=True):
        lights_i = light_anim(i, lights) if do_anim else lights
        lightmap = jnp.broadcast_to(
            env_u.ambient, (H, W, 4)).astype(jnp.float32)
        return lightmap + accumulate_sphere_lights(
            volume, gb, lights_i, env_u, config.quality,
            with_specular=False, shadow_mode="scan", with_ao=False)

    def run_variant(name, body, state0, out_shape):
        @partial(jax.jit, donate_argnums=(0,))
        def loop(state, n):
            def step(j, carry):
                st, acc = carry
                return body(j, st, acc)

            return jax.lax.fori_loop(
                0, n, step, (state, jnp.zeros(out_shape, jnp.float32)))

        st, acc = loop(state0, 10)
        fence(acc if acc.size else st.position)
        fence(st.position)
        t0 = time.perf_counter()
        st, acc = loop(st, FRAMES)
        fence(acc if acc.size else st.position)
        fence(st.position)
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"{name:48s} {dt * 1e3:8.3f} ms/frame")
        return st

    # Prime.
    @partial(jax.jit, donate_argnums=(0,))
    def prime(state):
        return jax.lax.fori_loop(
            0, 60, lambda i, st: particles_step(jnp.asarray(i, jnp.int32),
                                                st), state)

    state = prime(state0)
    fence(state.position)
    print("live:", int(jnp.sum(state.position[:, 3] > 0.0)))

    state = run_variant(
        "A full frame (lighting + particles)",
        lambda j, st, acc: (particles_step(j, st),
                            lighting(j)),
        state, (H, W, 4))
    state = run_variant(
        "B particles only",
        lambda j, st, acc: (particles_step(j, st), acc),
        state, (1,))
    state = run_variant(
        "C lighting only (animated)",
        lambda j, st, acc: (st, lighting(j)),
        state, (H, W, 4))
    state = run_variant(
        "D lighting only (static lights)",
        lambda j, st, acc: (st, lighting(j, do_anim=False)),
        state, (H, W, 4))
    state = run_variant(
        "E nothing (carry copy floor)",
        lambda j, st, acc: (st, acc + 1.0),
        state, (H, W, 4))


if __name__ == "__main__":
    main()
