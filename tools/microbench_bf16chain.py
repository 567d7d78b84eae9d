"""Is a fused elementwise chain faster in bf16 than f32 on v5e VPU?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, H, W = 8, 1080, 1920
ITERS = 100

def chain(dt):
    z = jax.random.uniform(jax.random.key(0), (H, W), dt)
    n = jax.random.uniform(jax.random.key(1), (H, W), dt)
    lx = jnp.linspace(0, W, L).astype(dt)[:, None, None]
    def f(z, n, c):
        ys = jnp.arange(H, dtype=dt)[None, :, None]
        xs = jnp.arange(W, dtype=dt)[None, None, :]
        dx = xs - lx + c
        dy = ys - lx
        dz = z[None] - 32.0
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-6)
        df = jnp.clip(1.0 - (dist - 8.0) / 300.0, 0, 1)
        dot = jnp.clip(-(dx * n + dy * n + dz * n) / dist + 0.35, 0, 1)
        nf = dot * dot
        op = jnp.clip(nf * df * df + jnp.clip(8.0 - dist, 0, 1), 0, 1)
        return jnp.sum(op.astype(jnp.float32), axis=0)
    return f, z, n

def bench(name, dt):
    f, z, n = chain(dt)
    @jax.jit
    def loop(z, n):
        def body(i, c):
            out = f(z, n, (c[0, 0] * 1e-20).astype(dt))
            return out
        return jax.lax.fori_loop(0, 10, body, jnp.zeros((H, W), jnp.float32))
    o = loop(z, n); float(o[0, 0])
    t0 = time.perf_counter()
    for _ in range(ITERS // 10):
        o = loop(z, n)
    float(o[0, 0])
    dt_ms = (time.perf_counter() - t0) / ITERS * 1e3 - 30.0 / ITERS
    print(f"{name:40s} {dt_ms:7.3f} ms")

bench("falloff-like chain f32 (8,1080,1920)", jnp.float32)
bench("falloff-like chain bf16", jnp.bfloat16)
