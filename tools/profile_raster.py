"""Fresh raster stage split on primed flagship state (short prime)."""
import os, sys, time
from functools import partial
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, CAP = 1080, 1920, 1 << 20
from illuminant_tpu.scenes import build_flagship
from illuminant_tpu.raster import tiled as T
from illuminant_tpu.particles.spawner import spawn as spawn_fn
from illuminant_tpu.particles import transforms as tx
from illuminant_tpu.particles.integrate import integrate_with_distance_field

scene = build_flagship(height=H, width=W, capacity=CAP)
system = scene.system
su = system.system_uniforms(1.0 / 60.0)
rd = system.render_data
grav = scene.system.transforms[1]
grav_u = grav.uniforms(0.0)
spawn_u = scene.spawner.uniforms(0.0)
sc = jnp.asarray(scene.spawner.spawn_max, jnp.int32)
key = jax.random.key(0)

@partial(jax.jit, donate_argnums=(0,))
def prime(state):
    def body(i, st):
        k = jax.random.fold_in(key, i)
        st = spawn_fn(st, spawn_u, sc, k, scene.spawner.spawn_max)
        pos, vel = tx.apply_gravity(st.position, st.velocity, grav_u, su)
        st = st.replace(position=pos, velocity=vel)
        return integrate_with_distance_field(st, su, rd, scene.volume,
                                             substeps=1)
    return jax.lax.fori_loop(0, 120, body, state)

state = prime(system.state)
print("live:", int(jnp.sum(state.position[:, 3] > 0.0)))
cfg = scene.raster_config
x = state.position[:, 0]; y = state.position[:, 1]
color = state.render_color; size = state.render_data[:, 0]
live = state.live_mask()
ITERS = 100

def bench(name, f):
    @jax.jit
    def loop(x):
        def body(i, c):
            xx, acc = c
            out = f(xx)
            return (xx + acc * 1e-30, acc + out)
        return jax.lax.fori_loop(0, 10, body, (x, jnp.zeros(())))
    o = loop(x); float(o[1])
    t0 = time.perf_counter()
    for _ in range(ITERS // 10):
        o = loop(o[0])
    float(o[1])
    dt = (time.perf_counter() - t0) / ITERS * 1e3 - 30.0 / ITERS
    print(f"{name:44s} {dt:7.3f} ms")

bench("whole rasterize_tiled", lambda xx: jnp.sum(
    T.rasterize_tiled(cfg, xx, y, color, size, live)[0]
    .astype(jnp.float32)))
def _binsum(xx):
    u = T.bin_particles(cfg, xx, y, color, size, live, aligned=False,
                        stable=False)
    return (jnp.sum(u["x"]) + jnp.sum(u["size"])
            + sum(jnp.sum(c) for c in u["color"])
            + jnp.sum(u["valid"].astype(jnp.float32)))
bench("bin_particles only (sum-forced)", _binsum)

# key pack + sort only
gy, gx = cfg.grid
def sort_only(xx):
    txi = jnp.clip((xx / cfg.tile).astype(jnp.int32), 0, gx - 1)
    tyi = jnp.clip((y / cfg.tile).astype(jnp.int32), 0, gy - 1)
    keyv = T._pack_compact_key(tyi, txi, xx, y, cfg.tile)
    ops = [T._pack_rgb_size(color, cfg.color_scale, size)]
    s = lax.sort((keyv, *ops), num_keys=1, is_stable=False)
    return jnp.sum(s[0].astype(jnp.float32)) + jnp.sum(
        s[1].astype(jnp.float32))
bench("pack+sort only", sort_only)

def to_sorted(xx):
    txi = jnp.clip((xx / cfg.tile).astype(jnp.int32), 0, gx - 1)
    tyi = jnp.clip((y / cfg.tile).astype(jnp.int32), 0, gy - 1)
    keyv = T._pack_compact_key(tyi, txi, xx, y, cfg.tile)
    ops = [T._pack_rgb_size(color, cfg.color_scale, size)]
    return lax.sort((keyv, *ops), num_keys=1, is_stable=False)

nt = gy * gx
k_ = cfg.bin_capacity
spr = cfg.slots_per_row

def through_gather(xx):
    sorted_all = to_sorted(xx)
    skey = sorted_all[0]
    tids = jnp.arange(nt + 1, dtype=jnp.int32)
    t_ty = jnp.minimum(tids // gx, gy - 1)
    t_tx = tids % gx
    bounds = jnp.where(tids < nt, (t_ty << 24) | (t_tx << 18),
                       jnp.int32(0x7FFFFFFF))
    starts = jnp.searchsorted(skey, bounds).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    payload_ops = sorted_all
    p = len(payload_ops)
    n = xx.shape[0]
    rows_needed = k_ // spr + 1
    n_rows = -(-n // spr) + rows_needed
    pad = n_rows * spr - n
    packed = jnp.concatenate(
        [jnp.pad(op, (0, pad)).reshape(n_rows, spr) for op in payload_ops],
        axis=1)
    bins, valid = T._quad_gather(packed, starts[:-1], counts, k_, p,
                                 aligned=False, spr=spr)
    return (jnp.sum(bins[0]) + jnp.sum(bins[1])
            + jnp.sum(valid.astype(jnp.int32))).astype(jnp.float32)

def through_unpack(xx):
    sorted_all = to_sorted(xx)
    skey = sorted_all[0]
    tids = jnp.arange(nt + 1, dtype=jnp.int32)
    t_ty = jnp.minimum(tids // gx, gy - 1)
    t_tx = tids % gx
    bounds = jnp.where(tids < nt, (t_ty << 24) | (t_tx << 18),
                       jnp.int32(0x7FFFFFFF))
    starts = jnp.searchsorted(skey, bounds).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    payload_ops = sorted_all
    p = len(payload_ops)
    n = xx.shape[0]
    rows_needed = k_ // spr + 1
    n_rows = -(-n // spr) + rows_needed
    pad = n_rows * spr - n
    packed = jnp.concatenate(
        [jnp.pad(op, (0, pad)).reshape(n_rows, spr) for op in payload_ops],
        axis=1)
    bins, valid = T._quad_gather(packed, starts[:-1], counts, k_, p,
                                 aligned=False, spr=spr)
    u = T._unpack_bins(cfg, bins)
    return (jnp.sum(u["x"]) + jnp.sum(u["color"][0]) + jnp.sum(u["size"])
            + jnp.sum(valid.astype(jnp.float32)))

bench("sort+starts+gather (no unpack)", through_gather)
bench("sort+starts+gather+unpack", through_unpack)
