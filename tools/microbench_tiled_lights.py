"""Tiled-light-culling cost on the local accelerator.

Measures accumulate_particle_lights at 1080p for the tiled path vs the
strided subset at several discrete-light counts, plus the binning stage
alone. Records the numbers PERF.md cites for the tiled default.

Usage: python tools/microbench_tiled_lights.py [--small]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from illuminant_tpu.core.config import QualitySettings  # noqa: E402
from illuminant_tpu.lighting import gbuffer as gbuf  # noqa: E402
from illuminant_tpu.lighting.environment import (  # noqa: E402
    LightingEnvironment,
    SphereLightSource,
)
from illuminant_tpu.lighting.particle_light import (  # noqa: E402
    ParticleLightSource,
    accumulate_particle_lights,
)
from illuminant_tpu.particles.state import ParticleState  # noqa: E402
from illuminant_tpu.sdf.analytic import pack_scene  # noqa: E402


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])  # fence (axon)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return (time.time() - t0) / iters * 1e3


def main():
    small = "--small" in sys.argv
    h, w = (270, 480) if small else (1080, 1920)
    env = LightingEnvironment(ground_z=0.0, maximum_z=128.0)
    gb = gbuf.flat_ground(h, w, env.uniforms())
    scene = pack_scene([])
    env_u = env.uniforms()
    q = QualitySettings()
    rng = np.random.default_rng(1)

    for n in (256, 1024, 2048):
        st = ParticleState.empty(n)
        pos = np.zeros((n, 4), np.float32)
        pos[:, 0] = rng.uniform(0, w, n)
        pos[:, 1] = rng.uniform(0, h, n)
        pos[:, 2] = rng.uniform(6, 20, n)
        pos[:, 3] = 1.0
        col = np.ones((n, 4), np.float32)
        st = st.replace(position=jnp.asarray(pos), color=jnp.asarray(col))
        template = SphereLightSource(
            radius=3.0, ramp_length=40.0, color=(1, 1, 1, 0.1),
            cast_shadows=False)

        for method, kw in (
            ("tiled", dict(tile=64, tile_capacity=32)),
            ("subset", dict(max_lights=min(n, 128))),
        ):
            src = ParticleLightSource(template=template, method=method,
                                      **kw)

            @jax.jit
            def run(state):
                return accumulate_particle_lights(
                    scene, gb, state, src, env_u, q)

            ms = _timeit(run, st)
            print(f"n={n:5d} {method:7s} {kw}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
