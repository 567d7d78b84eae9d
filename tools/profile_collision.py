"""Cost split inside integrate_with_distance_field (carry-chained)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, CAP = 1080, 1920, 1 << 20
FRAMES = 300

from illuminant_tpu.scenes import build_flagship
from illuminant_tpu.sdf.analytic import scene_sample_p, scene_normal_p
from illuminant_tpu.particles.render_data import compute_render_data

scene = build_flagship(height=H, width=W, capacity=CAP)
volume = scene.volume
st = scene.system.state
rd = scene.system.render_data
N = CAP
k = jax.random.key(1)
x = jax.random.uniform(k, (N,), jnp.float32, 0, 1920)
y = jax.random.uniform(k, (N,), jnp.float32, 0, 1080)
z = jax.random.uniform(k, (N,), jnp.float32, 0, 40)
nprim = 0
import illuminant_tpu.sdf.analytic as an
print("scene groups:", jax.tree.map(lambda a: a.shape, volume))

def bench(name, f):
    # carry-dependent: f takes and returns an (N,) carry
    @jax.jit
    def loop(c0):
        return jax.lax.fori_loop(0, 10, lambda i, c: f(c), c0)
    o = loop(x); float(jnp.max(o.ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(FRAMES // 10):
        o = loop(o % 1920.0)
    float(jnp.max(o.ravel()[:8]))
    dt = (time.perf_counter() - t0) / FRAMES * 1e3 - 30.0 / FRAMES
    print(f"{name:40s} {dt:7.3f} ms per call")

bench("scene_sample_p 1M", lambda c: scene_sample_p(volume, c, y, z) + c * 1e-9)
bench("scene_normal_p fast 1M", lambda c: scene_normal_p(volume, c, y, z, fast=True)[0] * 1e-9 + c)

pos = st.position; vel = st.velocity; col = st.color
idx = jnp.arange(CAP, dtype=jnp.int32)
def crd(c):
    p = pos.at[:, 0].set(c)
    rc, rdata = compute_render_data(p, vel, col, idx, rd)
    return rc[:, 0] * 1e-9 + c
bench("compute_render_data 1M", crd)
