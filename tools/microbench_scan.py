"""Scan-shadow step-cost experiments.

The bidirectional column scan is the sequential backbone of the shadow
pass (~3.6 ms at 540x960 x 8 lights). Variants measured here:
  S1 current: two lax.scans (E/W over 960 cols, N/S over 540 rows)
  S2 unroll 64
  S3 packed carry: one (6, L, H) array instead of 3 x (2, L, H)
  S4 bf16 carries
  S5 merged: ONE 960-step scan stepping E/W and N/S together (N/S
     active only for the last 540 steps)

Usage: python tools/microbench_scan.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, L = 540, 960, 8
ITERS = 200
_BIG = 1e9


def fence(x):
    x = jax.tree_util.tree_leaves(x)[0].reshape(-1)
    return float(jnp.max(x[:: max(1, int(x.shape[0]) // 997 * 2 + 1)]))


def timed(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:56s} {dt * 1e3:9.3f} ms/iter")
    return dt


def loop(body):
    @jax.jit
    def run(*args):
        return lax.fori_loop(0, ITERS, lambda i, c: body(i, c, *args[1:]),
                             args[0])

    return run


def make_scan(unroll, dtype=jnp.float32, packed=False):
    def scan2(occ, lx_pair, ly, lr, n_cols):
        """One bidirectional scan like _bidirectional_scan, parametrized."""
        ys = jnp.arange(occ.shape[2], dtype=jnp.float32)[None, None, :]
        cols = jnp.arange(n_cols, dtype=jnp.float32)
        lx = lx_pair[:, :, None].astype(dtype)
        lyb = jnp.broadcast_to(ly[None, :, None], (2, L, 1)).astype(dtype)
        lrb = jnp.broadcast_to(lr[None, :, None], (2, L, 1)).astype(dtype)
        HH = occ.shape[2]

        def step(carry, inputs):
            x, occ_col = inputs
            dx = (x - lx).astype(dtype)
            in_front = dx >= 1.0
            f = ((ys - lyb) / jnp.maximum(dx, 1.0)).astype(dtype)
            f = jnp.clip(f, -1.0, 1.0)
            af = jnp.abs(f)
            near = (1.0 - af).astype(dtype)

            if packed:
                c = carry  # (3, 2, L, H)
                up = jnp.roll(c, 1, axis=3)
                dn = jnp.roll(c, -1, axis=3)
                res = c * near + jnp.where(f >= 0.0, up, dn) * af
                res_d, res_k, res_n = res[0], res[1], res[2]
            else:
                min_d, min_k, neg_k = carry

                def resample(c):
                    up = jnp.roll(c, 1, axis=2)
                    dn = jnp.roll(c, -1, axis=2)
                    return c * near + jnp.where(f >= 0.0, up, dn) * af

                res_d = resample(min_d)
                res_k = resample(min_k)
                res_n = resample(neg_k)
            big = jnp.asarray(_BIG if dtype == jnp.float32 else 3e38,
                              dtype)
            res_d = jnp.where(in_front, res_d, big)
            res_k = jnp.where(in_front, res_k, 0.0).astype(dtype)
            res_n = jnp.where(in_front, res_n, 0.0).astype(dtype)
            sample_valid = in_front & (dx > lrb)
            d_here = jnp.where(sample_valid, occ_col[:, None, :], big)
            new_d = jnp.minimum(res_d, d_here)
            new_k = jnp.where(d_here < res_d, dx, res_k)
            new_n = jnp.where(d_here < 0.0, dx, res_n)
            if packed:
                new = jnp.stack([new_d, new_k, new_n], axis=0)
                return new, (res_d, res_k, res_n)
            return (new_d, new_k, new_n), (res_d, res_k, res_n)

        if packed:
            init = jnp.stack([
                jnp.full((2, L, HH), _BIG, dtype),
                jnp.zeros((2, L, HH), dtype),
                jnp.zeros((2, L, HH), dtype)], axis=0)
        else:
            init = (jnp.full((2, L, HH), _BIG, dtype),
                    jnp.zeros((2, L, HH), dtype),
                    jnp.zeros((2, L, HH), dtype))
        _, outs = lax.scan(step, init, (cols, occ), unroll=unroll)
        return outs

    return scan2


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    key = jax.random.key(0)
    occ = jax.random.uniform(key, (H, W), jnp.float32, -4.0, 128.0)
    lx = jax.random.uniform(jax.random.key(1), (L,), jnp.float32, 0.0, W)
    ly = jax.random.uniform(jax.random.key(2), (L,), jnp.float32, 0.0, H)
    lr = jnp.full((L,), 8.0, jnp.float32)

    occ_cols = jnp.stack([occ.T, occ.T[::-1]], axis=1)  # (W, 2, H)
    occ_rows = jnp.stack([occ, occ[::-1]], axis=1)  # (H, 2, W)
    lx_ew = jnp.stack([lx, (W - 1.0) - lx], axis=0)
    lx_ns = jnp.stack([ly, (H - 1.0) - ly], axis=0)

    for nm, unroll, dtype, packed in (
        ("S1 two scans f32 unroll32", 32, jnp.float32, False),
        ("S2 two scans f32 unroll64", 64, jnp.float32, False),
        ("S2b two scans f32 unroll128", 128, jnp.float32, False),
        ("S3 two scans f32 packed carry", 32, jnp.float32, True),
        ("S4 two scans bf16 unroll32", 32, jnp.bfloat16, False),
        ("S4b two scans bf16 unroll64", 64, jnp.bfloat16, False),
    ):
        if not want(nm.split()[0]):
            continue
        scan2 = make_scan(unroll, dtype, packed)

        def body(i, c, occ_cols=occ_cols, occ_rows=occ_rows, scan2=scan2,
                 dtype=dtype):
            o1 = (occ_cols + i * 0.0).astype(dtype)
            o2 = occ_rows.astype(dtype)
            ew = scan2(o1, lx_ew, ly, lr, W)
            ns = scan2(o2, lx_ns, lx, lr, H)
            return c + ew[0][-1].astype(jnp.float32).sum() * 1e-20

        timed(nm, loop(body), jnp.zeros((), jnp.float32))

    if want("S5"):
        # Merged single scan: E/W over 960 cols; N/S rides along for the
        # last 540 steps (row input padded at the front).
        pad = W - H
        occ_rows_p = jnp.concatenate(
            [jnp.zeros((pad, 2, W), jnp.float32), occ_rows], axis=0)

        def merged(occ_cols, occ_rows_p):
            ys_h = jnp.arange(H, dtype=jnp.float32)[None, None, :]
            ys_w = jnp.arange(W, dtype=jnp.float32)[None, None, :]
            cols = jnp.arange(W, dtype=jnp.float32)
            lxe = lx_ew[:, :, None]
            lxn = lx_ns[:, :, None]
            ly_b = jnp.broadcast_to(ly[None, :, None], (2, L, 1))
            lx_b = jnp.broadcast_to(lx[None, :, None], (2, L, 1))
            lr_b = jnp.broadcast_to(lr[None, :, None], (2, L, 1))

            def one(carry, x, occ_col, lxp, lyp, ys, active):
                min_d, min_k, neg_k = carry
                dx = x - lxp
                in_front = (dx >= 1.0) & active
                f = jnp.clip((ys - lyp) / jnp.maximum(dx, 1.0), -1.0, 1.0)
                af = jnp.abs(f)
                near = 1.0 - af

                def resample(c):
                    up = jnp.roll(c, 1, axis=2)
                    dn = jnp.roll(c, -1, axis=2)
                    return c * near + jnp.where(f >= 0.0, up, dn) * af

                res_d = jnp.where(in_front, resample(min_d), _BIG)
                res_k = jnp.where(in_front, resample(min_k), 0.0)
                res_n = jnp.where(in_front, resample(neg_k), 0.0)
                sample_valid = in_front & (dx > lr_b)
                d_here = jnp.where(sample_valid, occ_col[:, None, :], _BIG)
                new_d = jnp.minimum(res_d, d_here)
                new_k = jnp.where(d_here < res_d, dx, res_k)
                new_n = jnp.where(d_here < 0.0, dx, res_n)
                return (new_d, new_k, new_n), (res_d, res_k, res_n)

            def step(carry, inputs):
                ew_c, ns_c = carry
                t, occ_col, occ_row = inputs
                ew_c, ew_out = one(ew_c, t, occ_col, lxe, ly_b, ys_h,
                                   jnp.bool_(True))
                ns_c, ns_out = one(ns_c, t - pad, occ_row, lxn, lx_b,
                                   ys_w, t >= pad)
                return (ew_c, ns_c), (ew_out, ns_out)

            init_ew = (jnp.full((2, L, H), _BIG, jnp.float32),
                       jnp.zeros((2, L, H), jnp.float32),
                       jnp.zeros((2, L, H), jnp.float32))
            init_ns = (jnp.full((2, L, W), _BIG, jnp.float32),
                       jnp.zeros((2, L, W), jnp.float32),
                       jnp.zeros((2, L, W), jnp.float32))
            _, outs = lax.scan(
                step, (init_ew, init_ns), (cols, occ_cols, occ_rows_p),
                unroll=32)
            return outs

        def body(i, c):
            outs = merged(occ_cols + i * 0.0, occ_rows_p)
            return c + outs[0][0][-1].sum() * 1e-20

        timed("S5 merged single 960-step scan", loop(body),
              jnp.zeros((), jnp.float32))


if __name__ == "__main__":
    main()
