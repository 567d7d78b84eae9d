"""searchsorted variants: 2041 tile bounds in 1M sorted keys."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, Q = 1 << 20, 2041
ITERS = 200
k = jax.random.key(0)
keys0 = jnp.sort(jax.random.randint(k, (N,), 0, 1 << 30, jnp.int32))
bounds = jnp.linspace(0, 1 << 30, Q).astype(jnp.int32)


def bench(name, f):
    @jax.jit
    def loop(keys):
        def body(i, c):
            kk, acc = c
            s = f(kk)
            return (kk + (acc * 1e-30).astype(kk.dtype)[None][0], acc + s[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, 10, body, (keys, jnp.zeros(())))
    o = loop(keys0); float(o[1])
    t0 = time.perf_counter()
    for _ in range(ITERS // 10):
        o = loop(o[0])
    float(o[1])
    dt = (time.perf_counter() - t0) / ITERS * 1e3 - 30.0 / ITERS
    print(f"{name:44s} {dt:7.3f} ms")

bench("searchsorted default (scan)",
      lambda kk: jnp.searchsorted(kk, bounds))
bench("searchsorted compare_all",
      lambda kk: jnp.searchsorted(kk, bounds, method="compare_all"))
bench("searchsorted sort",
      lambda kk: jnp.searchsorted(kk, bounds, method="sort"))

def count_mm(kk):
    # starts via per-tile counts: tile id of each sorted key (shift 18),
    # one-hot bf16 matmul count, exclusive cumsum.
    tid = (kk >> 18).astype(jnp.int32)
    oh = (tid[:, None] == jnp.arange(Q - 1, dtype=jnp.int32)[None, :] >> 0)
    counts = jnp.sum(oh.astype(jnp.bfloat16), axis=0, dtype=jnp.float32)
    return jnp.cumsum(counts.astype(jnp.int32))
bench("one-hot count + cumsum (2040 tiles)", count_mm)
