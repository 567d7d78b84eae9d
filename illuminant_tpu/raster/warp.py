"""Screen-space warps: vector-field displacement + normal refraction.

Port of /root/reference/Illuminant/Shaders/VectorWarp.fx: a vector-field
texture displaces background pixels (VectorWarpPixelShader :28-60 — field
values unpack to signed directions, normalized and scaled by the field
intensity, with the field alpha masking/attenuating the result), and
NormalRefraction (:62-101) bends a view ray through a normal map with a
refraction index. Used by the VectorFieldTest scene and editor effects.

Per-pixel displaced reads are gathers — fine for an editor/post effect.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear(img, y, x):
    h, w = img.shape[0], img.shape[1]
    ty = y - 0.5
    tx = x - 0.5
    y0 = jnp.floor(ty)
    x0 = jnp.floor(tx)
    fy = (ty - y0)[..., None]
    fx = (tx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    return top + (bot - top) * fy


def vector_warp(background, field, intensity=(8.0, 8.0, 0.0),
                multiply_color=(1.0, 1.0, 1.0, 1.0)):
    """background (H, W, C); field (H, W, 4) with xyz in [0, 1] encoding
    signed directions and alpha as the effect mask -> warped (H, W, C)."""
    h, w = background.shape[0], background.shape[1]
    fv = (field[..., :3] - 0.5) * 2.0
    l = jnp.sqrt(jnp.maximum(jnp.sum(fv * fv, axis=-1, keepdims=True),
                             1e-12))
    direction = jnp.where(l >= 0.01, fv / l, 0.0)
    offs = direction * jnp.asarray(intensity, jnp.float32)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    warped = _bilinear(background, ys + offs[..., 1], xs + offs[..., 0])
    out = warped * jnp.asarray(multiply_color, jnp.float32)[
        ..., : background.shape[-1]
    ]
    alpha = field[..., 3:4]
    return jnp.where(alpha > 0.5 / 255.0, out * alpha, 0.0)


def normal_refraction_warp(background, normals, refraction_index=0.9,
                           normals_signed=False, strength=16.0):
    """NormalRefraction (VectorWarp.fx:62-101): refract a straight-down
    view ray through a normal map and sample the displaced background."""
    h, w = background.shape[0], background.shape[1]
    n = normals[..., :3]
    if not normals_signed:
        n = (n - 0.5) * 2.0
    n = n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                 1e-12))
    ray = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    # Snell refraction of `ray` about n.
    cos_i = -jnp.sum(ray * n, axis=-1, keepdims=True)
    eta = refraction_index
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    refracted = eta * ray + (eta * cos_i - jnp.sqrt(
        jnp.maximum(k, 0.0)
    )) * n
    offs = refracted[..., :2] * strength
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    warped = _bilinear(background, ys + offs[..., 1], xs + offs[..., 0])
    alpha = normals[..., 3:4]
    return warped * alpha + background * (1.0 - alpha)
