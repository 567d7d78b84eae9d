"""Per-pass timing of the flagship frame on the real chip.

Times each stage of the fused frame in isolation (ITERS reps per jitted
dispatch, host-transfer fence) so optimization targets the real costs.

Usage: python tools/profile_frame.py [pass ...]
"""

from __future__ import annotations

import os
import sys
import time

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 300
H, W = 1080, 1920
CAP = 1 << 20


def fence(x):
    x = x.reshape(-1)
    return float(jnp.max(x[:: max(1, x.shape[0] // 999 * 2 + 1)]))


def _leaf(out):
    if isinstance(out, tuple):
        out = out[0]
    if not hasattr(out, "reshape"):
        import jax as _jax
        out = _jax.tree_util.tree_leaves(out)[0]
    return out


def timed(name, run, *args):
    out = run(*args)
    fence(_leaf(out))
    t0 = time.perf_counter()
    out = run(*args)
    fence(_leaf(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt * 1e3:8.3f} ms")
    return dt


def loop(body, n=ITERS):
    @jax.jit
    def run(*args):
        def step(i, c):
            return body(i, c, *args[1:])

        return jax.lax.fori_loop(0, n, step, args[0])

    return run


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.core.config import QualitySettings
    from illuminant_tpu.lighting.scan_shadows import (
        occlusion_image, scan_visibility, upsample2x_bilinear,
        _bidirectional_scan)
    from illuminant_tpu.lighting.sphere import accumulate_sphere_lights
    from illuminant_tpu.particles.spawner import spawn as spawn_fn
    from illuminant_tpu.particles import transforms as tx
    from illuminant_tpu.particles.integrate import (
        integrate_with_distance_field)
    from illuminant_tpu.particles.render_data import compute_render_data
    from illuminant_tpu.sdf.analytic import scene_sample, scene_normal

    scene = build_flagship(height=H, width=W, capacity=CAP)
    volume = scene.volume
    gb = scene.gbuffer
    lights = scene.sphere_lights
    env_u = scene.environment.uniforms()
    q0 = QualitySettings(shadow_scale=0.5, scan_refine_samples=0)
    q1 = QualitySettings(shadow_scale=0.5, scan_refine_samples=1)
    q2 = QualitySettings(shadow_scale=0.5, scan_refine_samples=2)
    system = scene.system
    state = system.state
    key = jax.random.key(0)

    # Prime particle population.
    su = system.system_uniforms(1.0 / 60.0)
    rd = system.render_data
    grav = scene.system.transforms[1]
    grav_u = grav.uniforms(0.0)
    spawn_u = scene.spawner.uniforms(0.0)
    spawn_count = jnp.asarray(scene.spawner.spawn_max, jnp.int32)

    @jax.jit
    def prime(state, key):
        def body(i, st):
            k = jax.random.fold_in(key, i)
            st = spawn_fn(st, spawn_u, spawn_count, k,
                          scene.spawner.spawn_max)
            pos, vel = tx.apply_gravity(st.position, st.velocity, grav_u, su)
            st = st.replace(position=pos, velocity=vel)
            return integrate_with_distance_field(st, su, rd, volume)

        return jax.lax.fori_loop(0, 60, body, state)

    state = prime(state, key)
    print("live:", int(jnp.sum(state.position[:, 3] > 0.0)))

    sh, sw = H // 2, W // 2
    lx = lights.position[:, 0] * 0.5
    ly = lights.position[:, 1] * 0.5
    lr = lights.properties[:, 0]

    if want("occ"):
        def occ_body(i, c):
            return occlusion_image(volume, sh, sw, 16.0 + i * 0.0, 0.5)

        timed("occlusion image 960x540", loop(occ_body),
              jnp.zeros((sh, sw), jnp.float32))

    occ = occlusion_image(volume, sh, sw, 16.0, 0.5)

    if want("scan"):
        def scan_body(i, c):
            (e_d, _, _), _ = _bidirectional_scan(occ + i * 0.0, lx, ly, lr)
            return e_d

        timed("bidirectional scan E/W (8 lights)", loop(scan_body),
              jnp.zeros((8, sh, sw), jnp.float32))

    if want("vis"):
        for name, q in (("scan_visibility refine=0", q0),
                        ("scan_visibility refine=1", q1),
                        ("scan_visibility refine=2", q2)):
            def vis_body(i, c, q=q):
                return scan_visibility(
                    volume, sh, sw, lights.position, lights.properties[:, 0],
                    lights.properties[:, 1], q, trace_z=16.0 + i * 0.0,
                    render_scale=0.5)

            timed(name, loop(vis_body), jnp.zeros((8, sh, sw), jnp.float32))

    if want("acc"):
        for name, q in (("accumulate_sphere_lights refine=0", q0),):
            def acc_body(i, c, q=q):
                return accumulate_sphere_lights(
                    volume, gb, lights, env_u, q, with_specular=False,
                    shadow_mode="scan", with_ao=False)

            timed(name, loop(acc_body), jnp.zeros((H, W, 4), jnp.float32))

    if want("upsample"):
        vis = jnp.zeros((8, sh, sw), jnp.float32)

        def up_body(i, c):
            return upsample2x_bilinear(vis + i * 0.0)

        timed("upsample2x (8,540,960)", loop(up_body),
              jnp.zeros((8, H, W), jnp.float32))

    if want("particles"):
        def spawn_body(i, st):
            return spawn_fn(st, spawn_u, spawn_count,
                            jax.random.fold_in(key, i),
                            scene.spawner.spawn_max)

        timed("spawn 16k into 1M", loop(spawn_body), state)

        def grav_body(i, st):
            pos, vel = tx.apply_gravity(st.position, st.velocity, grav_u, su)
            return st.replace(position=pos, velocity=vel)

        timed("gravity 1M", loop(grav_body), state)

        def integ_body(i, st):
            return integrate_with_distance_field(st, su, rd, volume)

        timed("integrate+collision 1M", loop(integ_body), state)

        def sample_body(i, st):
            d = scene_sample(volume, st.position[:, :3] + i * 0.0)
            return st.replace(position=st.position + d[:, None] * 1e-20)

        timed("scene_sample 1M (one eval)", loop(sample_body), state)

        def normal_body(i, st):
            n = scene_normal(volume, st.position[:, :3] + i * 0.0)
            return st.replace(position=st.position + n[:, 0:1] * 1e-20)

        timed("scene_normal 1M", loop(normal_body), state)

        idx = jnp.arange(CAP, dtype=jnp.int32)

        def rdata_body(i, st):
            rc, rdata = compute_render_data(
                st.position + i * 0.0, st.velocity, st.color, idx, rd)
            return st.replace(render_color=rc, render_data=rdata)

        timed("compute_render_data 1M", loop(rdata_body), state)

    if want("frame"):
        # frame() is donated-jit; one call as a smoke check (per-frame
        # timing lives in tools/tune_flagship.py frame_variants).
        img, st2, avg2, drops = scene.frame(
            state, jnp.float32(0.5), key, volume, gb, lights, env_u,
            spawn_count)
        fence(img.astype(jnp.float32))


if __name__ == "__main__":
    main()
