"""Block-by-block cost of integrate_with_distance_field (substeps=1).

Stripped re-implementations of the integrate, peeling one block at a
time: delta(Vk, Vk+1) sizes the block.
"""
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
from illuminant_tpu.sdf.analytic import scene_sample_p, scene_normal_p
from illuminant_tpu.particles.integrate import (
    integrate_with_distance_field, _friction_max_p, _len3)
from illuminant_tpu.particles.render_data import compute_render_data

scene = build_flagship(height=H, width=W, capacity=CAP)
volume = scene.volume
system = scene.system
su = system.system_uniforms(1.0 / 60.0)
rd = system.render_data
state0 = system.state

def fence(x):
    return float(jnp.max(x.ravel()[:8]))

def run(name, body):
    @partial(jax.jit, donate_argnums=(0,))
    def loop(state, n):
        return jax.lax.fori_loop(0, n, body, state)
    st = loop(jax.tree.map(jnp.copy, state0), 10); fence(st.position)
    t0 = time.perf_counter()
    st = loop(st, FRAMES); fence(st.position)
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"{name:52s} {dt * 1e3:7.3f} ms/frame")

run("V1 full integrate substeps=1",
    lambda i, st: integrate_with_distance_field(st, su, rd, volume,
                                                substeps=1))

def stripped(i, st, with_crd=True, with_outcome=True, with_sub=True,
             with_init=True):
    pos = st.position; vel = st.velocity
    dt = su.dt
    ox, oy, oz = pos[:, 0], pos[:, 1], pos[:, 2]
    new_life = pos[:, 3] - su.life_decay * dt
    was_alive = pos[:, 3] > 0.0
    alive = (new_life > 0.0) & was_alive
    v0x, v0y, v0z, v0w = vel[:, 0], vel[:, 1], vel[:, 2], vel[:, 3]
    v0len = _len3(v0x, v0y, v0z)
    ux, uy, uz = v0x / v0len, v0y / v0len, v0z / v0len
    vx, vy, vz, _ = _friction_max_p(v0x, v0y, v0z, su)
    scaled_len = _len3(vx, vy, vz) * dt
    if with_init:
        initial = scene_sample_p(volume, ox, oy, oz)
    else:
        initial = oz * 0 + 1e9
    travel = jnp.maximum(0.0, jnp.minimum(initial, scaled_len))
    if with_sub:
        tx_ = ox + travel * ux; ty_ = oy + travel * uy; tz_ = oz + travel * uz
        stepd = scene_sample_p(volume, tx_, ty_, tz_)
        hit = stepd < su.collision_settings[2]
    else:
        hit = travel < -1.0
    if with_outcome:
        nnx, nny, nnz = scene_normal_p(volume, ox, oy, oz, fast=True)
        bounce_dir = nnx * ux + nny * uy + nnz * uz
        out_vx = jnp.where(hit, -vx * bounce_dir, vx)
        out_vy = jnp.where(hit, -vy * bounce_dir, vy)
        out_vz = jnp.where(hit, -vz, vz)
    else:
        out_vx, out_vy, out_vz = vx, vy, vz
    n_px = ox + travel * ux; n_py = oy + travel * uy; n_pz = oz + travel * uz
    keep = alive
    def sel(new, old):
        return jnp.where(keep, new, jnp.where(was_alive, 0.0, old))
    new_pos = jnp.stack([sel(n_px, pos[:, 0]), sel(n_py, pos[:, 1]),
                         sel(n_pz, pos[:, 2]), sel(new_life, pos[:, 3])],
                        axis=-1)
    new_vel = jnp.stack([sel(out_vx, vel[:, 0]), sel(out_vy, vel[:, 1]),
                         sel(out_vz, vel[:, 2]), vel[:, 3]], axis=-1)
    if with_crd:
        index = jnp.arange(CAP, dtype=jnp.int32)
        rc, rdd = compute_render_data(new_pos, new_vel, st.color, index, rd)
        return st.replace(position=new_pos, velocity=new_vel,
                          render_color=rc, render_data=rdd)
    return st.replace(position=new_pos, velocity=new_vel)

run("V2 stripped (init+sub evals, simple outcome, crd)", stripped)
run("V3 V2 - render_data", partial(stripped, with_crd=False))
run("V4 V3 - outcome/normal", partial(stripped, with_crd=False,
                                      with_outcome=False))
run("V5 V4 - substep eval", partial(stripped, with_crd=False,
                                    with_outcome=False, with_sub=False))
run("V6 V5 - initial eval", partial(stripped, with_crd=False,
                                    with_outcome=False, with_sub=False,
                                    with_init=False))
