"""Is (N, 4) f32 state layout the particle-sim bottleneck?

Compares an integrate-like op chain over:
  A: (N, 4) arrays, component access x[:, i]      (current ParticleState)
  B: (4, N) arrays, component access x[i]         (planar candidate)
to estimate the win of a planar refactor before doing it.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
ITERS = 300


def bench(name, f, *args):
    g = jax.jit(f)
    out = g(*args); jnp.max(out[0] if isinstance(out, tuple) else out).block_until_ready()
    float(jnp.sum(out[0].ravel()[:8] if isinstance(out, tuple) else out.ravel()[:8]))
    t0 = time.perf_counter()
    out = g(*args)
    for _ in range(ITERS - 1):
        out = g(*args)
    float(jnp.sum(out[0].ravel()[:8] if isinstance(out, tuple) else out.ravel()[:8]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3 - 30.0 / ITERS
    print(f"{name:44s} {dt:7.3f} ms")


k = jax.random.key(0)
pos_n4 = jax.random.normal(k, (N, 4), jnp.float32)
vel_n4 = jax.random.normal(k, (N, 4), jnp.float32)
pos_4n = pos_n4.T.copy()
vel_4n = vel_n4.T.copy()


def step_n4(p, v):
    # gravity toward a point + drag + euler, life decay (like flagship)
    dx = 960.0 - p[:, 0]; dy = 540.0 - p[:, 1]
    r2 = dx * dx + dy * dy + 100.0
    inv = jax.lax.rsqrt(r2)
    ax = dx * inv * 32.0; ay = dy * inv * 32.0
    vx = v[:, 0] * 0.99 + ax * (1 / 60); vy = v[:, 1] * 0.99 + ay * (1 / 60)
    vz = v[:, 2]; vw = v[:, 3]
    px = p[:, 0] + vx * (1 / 60); py = p[:, 1] + vy * (1 / 60)
    pz = p[:, 2]; pw = p[:, 3] - (1 / 60)
    live = pw > 0
    p2 = jnp.stack([jnp.where(live, px, p[:, 0]),
                    jnp.where(live, py, p[:, 1]), pz,
                    jnp.maximum(pw, 0.0)], axis=-1)
    v2 = jnp.stack([vx, vy, vz, vw], axis=-1)
    return p2, v2


def step_4n(p, v):
    dx = 960.0 - p[0]; dy = 540.0 - p[1]
    r2 = dx * dx + dy * dy + 100.0
    inv = jax.lax.rsqrt(r2)
    ax = dx * inv * 32.0; ay = dy * inv * 32.0
    vx = v[0] * 0.99 + ax * (1 / 60); vy = v[1] * 0.99 + ay * (1 / 60)
    px = p[0] + vx * (1 / 60); py = p[1] + vy * (1 / 60)
    pw = p[3] - (1 / 60)
    live = pw > 0
    p2 = jnp.stack([jnp.where(live, px, p[0]),
                    jnp.where(live, py, p[1]), p[2],
                    jnp.maximum(pw, 0.0)], axis=0)
    v2 = jnp.stack([vx, vy, v[2], v[3]], axis=0)
    return p2, v2


def chain(step, n):
    def f(p, v):
        def body(i, c):
            p, v = c
            p, v = step(p, v)
            return (p, v)
        return jax.lax.fori_loop(0, n, body, (p, v))
    return f


bench("A  (N,4) integrate-chain x10", chain(step_n4, 10), pos_n4, vel_n4)
bench("B  (4,N) integrate-chain x10", chain(step_4n, 10), pos_4n, vel_4n)

# pure elementwise traffic probe
bench("A  (N,4) axpy x10", chain(lambda p, v: (p + v * 0.016, v * 0.999), 10), pos_n4, vel_n4)
bench("B  (4,N) axpy x10", chain(lambda p, v: (p + v * 0.016, v * 0.999), 10), pos_4n, vel_4n)

# roll-window spawn probe: dynamic_update_slice of 4096 rows vs planar
spawn_n4 = jnp.ones((4096, 4), jnp.float32)
spawn_4n = jnp.ones((4, 4096), jnp.float32)
bench("A  (N,4) dus-spawn x10",
      chain(lambda p, v: (jax.lax.dynamic_update_slice(p, spawn_n4, (9000, 0)), v), 10),
      pos_n4, vel_n4)
bench("B  (4,N) dus-spawn x10",
      chain(lambda p, v: (jax.lax.dynamic_update_slice(p, spawn_4n, (0, 9000)), v), 10),
      pos_4n, vel_4n)
