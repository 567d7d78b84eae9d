"""Benchmark harness.

Measures the FULL BASELINE.md config-5 workload on the local accelerator:
1080p 8-light SDF-shadowed light resolve with dynamic occluders, a
1M-particle step (bezier-animated spawner, gravity, SDF collision),
full-resolution tiled particle rasterization, HDR luminance histogram
auto-exposure, and Uncharted2 tonemap resolve to uint8 — one jitted frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = frames (steps) per second of the fused frame; vs_baseline is
against the 60 steps/s target (BASELINE.json north_star). Extra context
fields (Mpix/s, live particles, raster drops) ride along.

Usage: python bench.py [--small] [--frames N]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: a fresh bench process reuses prior
# compiles (the remote compiler is the dominant cost of a cold run).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    small = "--small" in sys.argv
    frames = 400
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    # Device-init watchdog: a dead axon tunnel makes jax.devices() HANG
    # (observed 2026-08-18: multi-hour outage with no error raised).
    # Rather than hanging the driver forever, print an honest error line
    # and exit once init exceeds the deadline.
    import os as _os
    import threading

    init_done = threading.Event()
    deadline = float(_os.environ.get("BENCH_INIT_TIMEOUT", "900"))

    def _watchdog():
        if not init_done.wait(deadline):
            print(json.dumps({
                "metric": "1080p light-resolve Mpix/s; 1M-particle "
                          "steps/sec",
                "value": 0.0,
                "unit": "fused frames/sec",
                "vs_baseline": 0.0,
                "error": f"accelerator init hang (> {deadline:.0f}s — "
                         "axon tunnel down?)",
            }), flush=True)
            _os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    dev = jax.devices()[0]
    init_done.set()
    print(f"# device: {dev}", file=sys.stderr)

    # Resilience: if the full-size run dies (remote-compile flake, OOM),
    # fall back to smaller configs so a result line is always printed.
    configs = (
        [(270, 480, 1 << 16)]
        if small
        else [(1080, 1920, 1 << 20), (540, 960, 1 << 18),
              (270, 480, 1 << 16)]
    )
    last_error = None
    for height, width, capacity in configs:
        # The axon tunnel occasionally throws transient backend errors
        # (FailedPrecondition at device_put observed); retry the SAME
        # config before degrading resolution.
        for attempt in range(3):
            try:
                _run_config(height, width, capacity, frames)
                return
            except Exception as e:  # noqa: BLE001 — report and degrade
                last_error = e
                print(f"# config {width}x{height} attempt {attempt} "
                      f"failed: {e}", file=sys.stderr)
                time.sleep(20)
    raise last_error


def _run_config(height, width, capacity, frames):
    fast = _bench_preset("fast", height, width, capacity, frames)
    result = {
        "metric": "1080p light-resolve Mpix/s; 1M-particle steps/sec",
        "value": fast["fps"],
        "unit": "fused frames/sec (full config-5: 8-light SDF resolve + "
                "dynamic occluders + 1M-particle step + tiled raster + "
                "HDR histogram tonemap)",
        "vs_baseline": round(fast["fps"] / 60.0, 4),
        "mpix_per_sec": fast["mpix_per_sec"],
        "resolution": f"{width}x{height}",
        "particle_capacity": capacity,
        "live_particles": fast["live_particles"],
        "raster_dropped_max": fast["raster_dropped_max"],
        "device": str(jax.devices()[0]),
    }
    # Reference-parity quality row (VERDICT r2 #1): collision substeps 3,
    # full-res shadows + march-equivalent refine, round disc kernel, full
    # payload. Benched at fewer frames (it is the slower row); a failure
    # here must not lose the fast row.
    try:
        parity = _bench_preset(
            "parity", height, width, capacity, max(frames // 2, 200)
        )
        result["parity_fps"] = parity["fps"]
        result["parity_vs_baseline"] = round(parity["fps"] / 60.0, 4)
        result["parity_raster_dropped_max"] = parity["raster_dropped_max"]
        result["parity_unit"] = (
            "same frame at reference-parity quality: collision_substeps "
            "3, shadow_scale 1.0, march-equivalent refine (A/B: test_refine_quality), round kernel, "
            "full-precision payload"
        )
    except Exception as e:  # noqa: BLE001
        print(f"# parity row failed: {e}", file=sys.stderr)
    # Full-light-family row (VERDICT r2 #2): the flagship plus a
    # directional sun, a line light, a shadowed volumetric, a projector
    # and 32 particle lights — config 5's "full Lumined scene" words.
    try:
        fam = _bench_preset(
            "fast", height, width, capacity, max(frames // 2, 200),
            full_family=True,
        )
        result["full_family_fps"] = fam["fps"]
        result["full_family_vs_baseline"] = round(fam["fps"] / 60.0, 4)
        result["full_family_unit"] = (
            "flagship + directional sun + line + shadowed volumetric + "
            "projector + 32 particle lights, one fused frame"
        )
    except Exception as e:  # noqa: BLE001
        print(f"# full-family row failed: {e}", file=sys.stderr)
    # Parity x full-family row (VERDICT r3 #4): every family at lightmap
    # resolution (extra_family_scale 1.0 — the reference shades all
    # families in one lightmap-res light pass, LightingRenderer.cs:
    # 1004-1168) on top of the parity quality point.
    try:
        pfam = _bench_preset(
            "parity", height, width, capacity, max(frames // 2, 200),
            full_family=True,
        )
        result["parity_full_family_fps"] = pfam["fps"]
        result["parity_full_family_vs_baseline"] = round(
            pfam["fps"] / 60.0, 4)
        result["parity_full_family_unit"] = (
            "full light family at parity quality: every family at "
            "lightmap res, collision_substeps 3, shadow_scale 1.0, "
            "round kernel, full-precision payload"
        )
    except Exception as e:  # noqa: BLE001
        print(f"# parity full-family row failed: {e}", file=sys.stderr)
    # Voxel-field row (VERDICT r3 #8): the reference's PRODUCTION field
    # is the baked voxel atlas (DistanceField.cs:18-22); this row renders
    # the flagship from a baked+saved+loaded SdfVolume (static partition)
    # with the dynamic partition regenerated per frame
    # (DynamicDistanceField, :248-321) — the path a shipped Lumined
    # scene exercises.
    try:
        vox = _bench_preset(
            "fast", height, width, capacity, max(frames // 2, 200),
            field="voxel",
        )
        result["voxel_fps"] = vox["fps"]
        result["voxel_vs_baseline"] = round(vox["fps"] / 60.0, 4)
        result["voxel_unit"] = (
            "flagship rendered from a baked save/load SdfVolume static "
            "partition + per-frame dynamic partition regen (the shipped-"
            "scene field path, DistanceField.cs:18-22,178-213,248-321)"
        )
    except Exception as e:  # noqa: BLE001
        print(f"# voxel row failed: {e}", file=sys.stderr)
    print(json.dumps(result))


def _bench_preset(preset, height, width, capacity, frames,
                  full_family=False, field="analytic"):
    from illuminant_tpu.scenes import build_flagship

    scene = build_flagship(height=height, width=width, capacity=capacity,
                           preset=preset, full_family=full_family,
                           field=field)
    state = scene.system.state
    key = jax.random.key(0)
    env_u = scene.environment.uniforms()
    avg_lum = jnp.asarray(0.5, jnp.float32)

    spawn_count = jnp.asarray(scene.spawner.spawn_max, jnp.int32)

    def run(state, avg_lum, i0, n):
        return scene.frame_loop(
            state, avg_lum, key, scene.volume, scene.gbuffer,
            scene.sphere_lights, env_u, spawn_count,
            jnp.asarray(i0, jnp.int32), n,
        )

    # Warm up: compile + prime the particle population.
    # NOTE: block_until_ready does not actually synchronize on the axon
    # backend — a small host transfer is the only reliable fence.
    def fence(x):
        return float(jnp.max(x[::257, 0].astype(jnp.float32)))

    # DURATION-AWARE dispatch chunking (round-5 fix for the round-4
    # voxel-row crash): a single XLA execution that runs for minutes
    # kills the TPU worker ("kernel fault" — repro:
    # tools/repro_voxel_crash.py; 400 slow frames in one dispatch died
    # on the FIRST chunk, the same workload at 8 frames/dispatch ran
    # clean). Probe the per-frame cost with a small dispatch, then pick
    # the largest chunk that keeps each dispatch under ~8 s — big
    # chunks still amortize the ~30 ms axon tunnel latency for fast
    # presets (400 frames at 60 fps is 6.7 s).
    probe = 8
    img, state, avg_lum, drops = run(state, avg_lum, 0, probe)
    fence(img)
    fence(state.position)  # also compiles the state-fence op
    t0 = time.perf_counter()
    img, state, avg_lum, drops = run(state, avg_lum, probe, probe)
    fence(img)
    tpf = (time.perf_counter() - t0) / probe
    chunk = next((n for n in (400, 100, 25, 8) if n * tpf <= 8.0), 8)
    done = 2 * probe
    if chunk != probe:
        # Compile + settle the main chunk size.
        img, state, avg_lum, drops = run(state, avg_lum, done, chunk)
        fence(img)
        done += chunk
    # Bound the measured wall-clock (~45 s) so a slow row reports a
    # number instead of eating the driver's budget.
    frames = min(max(frames, chunk), max(chunk, int(45.0 / max(tpf, 1e-6))))
    n_chunks = frames // chunk
    t0 = time.perf_counter()
    for c in range(n_chunks):
        img, state, avg_lum, drops = run(state, avg_lum,
                                         done + c * chunk, chunk)
    fence(img)
    fence(state.position)
    dt = time.perf_counter() - t0
    frames = n_chunks * chunk

    steps_per_sec = frames / dt
    mpix_per_sec = steps_per_sec * height * width / 1e6
    live = int(jnp.sum(state.position[:, 3] > 0.0))

    return {
        "fps": round(steps_per_sec, 3),
        "mpix_per_sec": round(mpix_per_sec, 1),
        "live_particles": live,
        "raster_dropped_max": int(drops),
    }


if __name__ == "__main__":
    main()
