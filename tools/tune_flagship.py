"""Tune the flagship scene: tile-occupancy distribution + stage costs.

Runs the primed flagship state and reports per-tile particle occupancy
(max / p99.9 / drops at various K) so the scene's motion design keeps the
rasterizer honest (zero drops), plus stage timings of the NEW full frame.

Usage: python tools/tune_flagship.py [occupancy] [stages]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, CAP = 1080, 1920, 1 << 20


def fence(x):
    x = x.reshape(-1)
    return float(jnp.max(x[:: max(1, int(x.shape[0]) // 997 * 2 + 1)]
                         ).astype(jnp.float32))


def main():
    what = set(sys.argv[1:]) or {"occupancy"}
    from illuminant_tpu.scenes import build_flagship

    scene = build_flagship(height=H, width=W, capacity=CAP)
    env_u = scene.environment.uniforms()
    key = jax.random.key(0)
    spawn_count = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
    state = scene.system.state
    avg = jnp.asarray(0.5, jnp.float32)

    # Prime 400 frames.
    img, state, avg, drops = scene.frame_loop(
        state, avg, key, scene.volume, scene.gbuffer,
        scene.sphere_lights, env_u, spawn_count, jnp.asarray(0, jnp.int32), 400)
    fence(img)

    if "occupancy" in what:
        pos = np.asarray(state.position)
        live = pos[:, 3] > 0
        x = np.clip(pos[live, 0], 0, W - 1)
        y = np.clip(pos[live, 1], 0, H - 1)
        tile = (y // 32).astype(np.int64) * 60 + (x // 32).astype(np.int64)
        counts = np.bincount(tile, minlength=34 * 60)
        cs = np.sort(counts)
        print(f"live={live.sum()} tiles_max={cs[-1]} "
              f"p99.9={cs[int(0.999 * len(cs))]} "
              f"p99={cs[int(0.99 * len(cs))]} mean={counts.mean():.0f}")
        for k in (512, 1024, 2048, 4096):
            print(f"  drops@K={k}: {np.maximum(counts - k, 0).sum()}")

    if "stages" in what:
        ITERS = 100
        from functools import partial

        def timed_loop(name, body):
            @jax.jit
            def run(c):
                return jax.lax.fori_loop(0, ITERS, body, c)

            c = run((state, jnp.zeros((H, W, 4), jnp.float32)))
            fence(c[1])
            t0 = time.perf_counter()
            c = run(c)
            fence(c[1])
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:42s} {dt * 1e3:8.3f} ms")

        from illuminant_tpu.raster.tiled import rasterize_tiled
        from illuminant_tpu.utils.histogram import (
            bucket_boundaries, compute_histogram, percentile)
        from illuminant_tpu.ops import tonemap as tm

        rc = scene.raster_config

        def raster_body(i, c):
            st, acc = c
            # Carry-dependent input defeats XLA loop-invariant hoisting.
            eps = acc[0, 0, 0] * 1e-30
            img, diag = rasterize_tiled(
                rc, st.position[:, 0] + eps, st.position[:, 1],
                st.render_color, st.render_data[:, 0], st.live_mask())
            return (st, acc.at[..., :img.shape[-1]].add(img * 1e-20))

        timed_loop("tiled raster 1M @1080p K=%d" % rc.bin_capacity,
                   raster_body)

        bounds = jnp.asarray(bucket_boundaries(max_value=64.0))

        def hist_body(i, c):
            st, acc = c
            h = compute_histogram(acc[::2, ::2], bounds)
            p = percentile(h, 95.0)
            return (st, acc + p * 1e-20)

        timed_loop("histogram 2x-subsampled + percentile", hist_body)

        def tone_body(i, c):
            st, acc = c
            mapped = tm.uncharted2_tonemap(acc[..., :3])
            img = (jnp.clip(mapped, 0.0, 1.0) ** (1 / 2.2) * 255.0
                   ).astype(jnp.uint8)
            return (st, acc + img.astype(jnp.float32).mean() * 1e-20)

        timed_loop("tonemap u8 resolve", tone_body)


if __name__ == "__main__":
    main()


def raster_stages():
    """Sub-stage timings of rasterize_tiled on the primed flagship state."""
    import time
    from functools import partial
    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.raster import tiled as T

    scene = build_flagship(height=H, width=W, capacity=CAP)
    env_u = scene.environment.uniforms()
    key = jax.random.key(0)
    sc = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
    state = scene.system.state
    avg = jnp.asarray(0.5, jnp.float32)
    img, state, avg, drops = scene.frame_loop(
        state, avg, key, scene.volume, scene.gbuffer,
        scene.sphere_lights, env_u, sc, jnp.asarray(0, jnp.int32), 300)
    fence(img.astype(jnp.float32))
    cfg = scene.raster_config
    ITERS = 100

    def timed_loop(name, body, init, *args):
        @jax.jit
        def run(c, *a):
            return jax.lax.fori_loop(0, ITERS,
                                     lambda i, cc: body(i, cc, *a), c)

        c = run(init, *args)
        fence(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        c = run(c, *args)
        fence(jax.tree_util.tree_leaves(c)[0].astype(jnp.float32))
        print(f"{name:44s} {(time.perf_counter() - t0) / ITERS * 1e3:8.3f} ms")

    x = state.position[:, 0]
    y = state.position[:, 1]
    color = state.render_color
    size = state.render_data[:, 0]
    live = state.live_mask()

    def bin_body(i, c, x, y, color, size, live):
        eps = c[0] * 1e-30
        bins = T.bin_particles(cfg, x + eps, y, color, size, live)
        return (c[0] + bins["x"][0, 0] * 1e-20,)

    timed_loop("R-bin (pack+sort+starts+gather+unpack)", bin_body,
               (jnp.zeros(()),), x, y, color, size, live)

    def whole_body(i, c, x, y, color, size, live):
        eps = c[0] * 1e-30
        img, diag = T.rasterize_tiled(cfg, x + eps, y, color, size, live)
        return (c[0] + img[0, 0, 0] * 1e-20,)

    timed_loop("R-whole rasterize_tiled shipped", whole_body,
               (jnp.zeros(()),), x, y, color, size, live)


if "raster_stages" in sys.argv:
    raster_stages()


def frame_variants():
    """In-frame cost attribution: the real flagship frame with stages
    disabled one at a time (includes all fusion effects)."""
    import time
    from functools import partial
    from illuminant_tpu.scenes import build_flagship
    from illuminant_tpu.raster.tiled import rasterize_tiled
    from illuminant_tpu.lighting.sphere import accumulate_sphere_lights
    from illuminant_tpu.particles.spawner import spawn as spawn_fn
    from illuminant_tpu.particles import transforms as tx
    from illuminant_tpu.particles.integrate import (
        integrate_with_distance_field)
    from illuminant_tpu.utils.histogram import (bucket_boundaries,
                                                compute_histogram,
                                                percentile)
    from illuminant_tpu.ops import tonemap as tm

    scene = build_flagship(height=H, width=W, capacity=CAP)
    env_u = scene.environment.uniforms()
    key = jax.random.key(0)
    sc = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
    state0 = scene.system.state
    avg0 = jnp.asarray(0.5, jnp.float32)
    img, state0, avg0, _ = scene.frame_loop(
        state0, avg0, key, scene.volume, scene.gbuffer,
        scene.sphere_lights, env_u, sc, jnp.asarray(0, jnp.int32), 300)
    fence(img.astype(jnp.float32))

    system = scene.system
    su = system.system_uniforms(1.0 / 60.0)
    rd = system.render_data
    grav = scene.system.transforms[1]
    grav_u = grav.uniforms(0.0)
    spawn_u = scene.spawner.uniforms(0.0)
    q = scene.config.quality
    rc = scene.raster_config
    bounds = jnp.asarray(bucket_boundaries(max_value=64.0))
    N_IT = 200

    def run_variant(name, lighting, particles, raster, resolve):
        @partial(jax.jit, donate_argnums=(0,), static_argnums=())
        def loop(state, avg, volume, gbuffer, lights):
            def body(i, carry):
                st, avg, acc = carry
                k = jax.random.fold_in(key, i)
                if lighting:
                    lm = jnp.broadcast_to(
                        env_u.ambient, (H, W, 4)).astype(jnp.float32)
                    lm = lm + accumulate_sphere_lights(
                        volume, gbuffer, lights, env_u, q,
                        with_specular=False, shadow_mode="scan",
                        with_ao=False)
                else:
                    lm = jnp.zeros((H, W, 4), jnp.float32)
                if particles:
                    st = spawn_fn(st, spawn_u, sc, k,
                                  scene.spawner.spawn_max)
                    pos, vel = tx.apply_gravity(st.position, st.velocity,
                                                grav_u, su)
                    st = st.replace(position=pos, velocity=vel)
                    st = integrate_with_distance_field(st, su, rd, volume)
                if raster:
                    pimg, diag = rasterize_tiled(
                        rc, st.position[:, 0], st.position[:, 1],
                        st.render_color, st.render_data[:, 0],
                        st.live_mask())
                    hdr = lm[..., :3] + pimg
                else:
                    hdr = lm[..., :3]
                if resolve:
                    hist = compute_histogram(hdr, bounds)
                    p95 = percentile(hist, 95.0)
                    avg = avg * 0.95 + p95 * 0.05
                    mapped = tm.uncharted2_tonemap(hdr * (1.1 / jnp.maximum(
                        avg, 0.05)))
                    out = (jnp.clip(mapped, 0, 1) ** (1 / 2.2) * 255.0
                           ).astype(jnp.uint8)
                    acc = acc + out[0, 0, 0].astype(jnp.float32)
                else:
                    acc = acc + hdr[0, 0, 0]
                return (st, avg, acc)

            return jax.lax.fori_loop(
                0, N_IT, body, (state, avg, jnp.zeros((), jnp.float32)))

        st = jax.tree.map(jnp.copy, state0)
        c = loop(st, avg0, scene.volume, scene.gbuffer,
                 scene.sphere_lights)
        fence(c[0].position)
        st = c[0]
        t0 = time.perf_counter()
        c = loop(st, c[1], scene.volume, scene.gbuffer,
                 scene.sphere_lights)
        fence(c[0].position)
        dt = (time.perf_counter() - t0) / N_IT
        print(f"{name:40s} {dt * 1e3:8.3f} ms/frame")

    run_variant("FULL frame", True, True, True, True)
    run_variant("no raster", True, True, False, True)
    run_variant("no lighting", False, True, True, True)
    run_variant("no particles+raster", True, False, False, True)
    run_variant("no resolve (hist+tonemap)", True, True, True, False)


if "frame_variants" in sys.argv:
    frame_variants()
