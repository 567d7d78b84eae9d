"""lax.sort variants for the raster bin: stable vs unstable, operand
counts, u32 vs f32 keys."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
ITERS = 200
k = jax.random.key(0)
key_u = jax.random.randint(k, (N,), 0, 1 << 30, jnp.int32).astype(jnp.uint32)
pay_u = jax.random.randint(k, (N,), 0, 1 << 30, jnp.int32).astype(jnp.uint32)


def bench(name, f, *args):
    g = jax.jit(f)
    o = g(*args); float(jnp.max(o.ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        o = g(*args)
    float(jnp.max(o.ravel()[:4]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3 - 30.0 / ITERS
    print(f"{name:46s} {dt:7.3f} ms")


def loop(f, n=5):
    def g(key_u, pay_u):
        def body(i, c):
            kk, pp = f(c[0], c[1])
            return (kk, pp)
        return lax.fori_loop(0, n, body, (key_u, pay_u))[0]
    return g

def sort2(stable):
    def f(a, b):
        r = lax.sort((a, b), num_keys=1, is_stable=stable)
        # keep carry varying but sorted-idempotent-breaking: rotate
        return (jnp.roll(r[0], 1), r[1])
    return f

bench("sort key+1op stable x5", loop(sort2(True)), key_u, pay_u)
bench("sort key+1op unstable x5", loop(sort2(False)), key_u, pay_u)

def sort1(stable):
    def f(a, b):
        r = lax.sort((a,), num_keys=1, is_stable=stable)
        return (jnp.roll(r[0], 1), b)
    return f

bench("sort key only stable x5", loop(sort1(True)), key_u, pay_u)
bench("sort key only unstable x5", loop(sort1(False)), key_u, pay_u)

def sort3(stable):
    def f(a, b):
        r = lax.sort((a, b, jnp.roll(b, 3)), num_keys=1, is_stable=stable)
        return (jnp.roll(r[0], 1), r[1])
    return f

bench("sort key+2op stable x5", loop(sort3(True)), key_u, pay_u)
bench("sort key+2op unstable x5", loop(sort3(False)), key_u, pay_u)
