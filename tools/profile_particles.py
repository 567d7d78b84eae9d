"""Stage isolation inside the flagship particle step (5.1 ms/frame)."""
import os, sys, time
from functools import partial
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, CAP = 1080, 1920, 1 << 20
FRAMES = 300

from illuminant_tpu.scenes import build_flagship
from illuminant_tpu.particles.spawner import spawn as spawn_fn
from illuminant_tpu.particles import transforms as tx
from illuminant_tpu.particles.integrate import integrate_with_distance_field

scene = build_flagship(height=H, width=W, capacity=CAP)
volume = scene.volume
system = scene.system
su = system.system_uniforms(1.0 / 60.0)
rd = system.render_data
grav = scene.system.transforms[1]
grav_u = grav.uniforms(0.0)
tx0 = scene.system.transforms[0]
tx0_u = tx0.uniforms(0.0)
spawn_u = scene.spawner.uniforms(0.0)
spawn_count = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
key = jax.random.key(0)
print("transforms:", [type(t).__name__ for t in scene.system.transforms])
print("scene prims:", {k: v.shape for k, v in vars(volume).items() if hasattr(v, 'shape')} if not hasattr(volume, 'types') else volume.types.shape)

def fence(x):
    return float(jnp.max(x.ravel()[:8]))

def run(name, body, state0):
    @partial(jax.jit, donate_argnums=(0,))
    def loop(state, n):
        return jax.lax.fori_loop(0, n, body, state)
    st = loop(jax.tree.map(jnp.copy, state0), 10); fence(st.position)
    t0 = time.perf_counter()
    st = loop(st, FRAMES); fence(st.position)
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"{name:44s} {dt * 1e3:7.3f} ms/frame")
    return st

def full(i, state):
    k = jax.random.fold_in(key, i)
    state = spawn_fn(state, spawn_u, spawn_count, k, scene.spawner.spawn_max)
    pos, vel = tx.apply_gravity(state.position, state.velocity, grav_u, su)
    state = state.replace(position=pos, velocity=vel)
    return integrate_with_distance_field(state, su, rd, volume, substeps=1)

state = run("full particle step", full, system.state)

run("spawn only", lambda i, st: spawn_fn(
    st, spawn_u, spawn_count, jax.random.fold_in(key, i),
    scene.spawner.spawn_max), state)

def grav_only(i, st):
    pos, vel = tx.apply_gravity(st.position, st.velocity, grav_u, su)
    return st.replace(position=pos, velocity=vel)
run("gravity only", grav_only, state)

run("integrate substeps=3", lambda i, st: integrate_with_distance_field(
    st, su, rd, volume), state)
run("integrate substeps=1", lambda i, st: integrate_with_distance_field(
    st, su, rd, volume, substeps=1), state)

# integrate WITHOUT collision: plain euler + life
def euler_only(i, st):
    p = st.position; v = st.velocity
    dt = su.delta_time_seconds if hasattr(su, 'delta_time_seconds') else (1/60)
    newp = p.at[:, :3].add(v[:, :3] * (1 / 60))
    newp = newp.at[:, 3].add(-1 / 60)
    return st.replace(position=newp)
run("euler+life only (no collision)", euler_only, state)
