"""Map-generation tooling (the GenerateMaps editor scene).

normals_from_lightmaps ports /root/reference/Illuminant/Shaders/
ProcessNormals.fx (NormalsFromLightmaps): four lightmaps captured with a
light to the left/right/above/below of the subject become a tangent-space
normal map — n = normalize(right - left, below - above, forward) with the
input normalization window and dead-pixel detection (:52-100). Pure
elementwise math on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _clean_input(value, input_min, input_max, shadows_only):
    result = (value - input_min) / jnp.maximum(input_max - input_min, 1e-6)
    if shadows_only:
        result = result - 0.5
    return jnp.clip(result, 0.0, 1.0)


def normals_from_lightmaps(
    left,
    right,
    above,
    below,
    input_min: float = 0.0,
    input_max: float = 1.0,
    forward_scale: float = 1.0,
    forward_bias: float = 0.0,
    shadows_only: bool = False,
):
    """Four (H, W) luminance lightmaps -> (H, W, 4) encoded normal map.

    Dead pixels (all four inputs dark, ProcessNormals.fx:94-97) encode as
    (0, 0, 0, 1); everything else as normal * 0.5 + 0.5 (:156-159).
    """
    l = _clean_input(left, input_min, input_max, shadows_only)
    r = _clean_input(right, input_min, input_max, shadows_only)
    a = _clean_input(above, input_min, input_max, shadows_only)
    b = _clean_input(below, input_min, input_max, shadows_only)

    x_delta = r - l
    y_delta = b - a
    xy_len = jnp.sqrt(x_delta * x_delta + y_delta * y_delta)
    forward = jnp.where(
        xy_len <= 0.01,
        1.0,
        jnp.where(
            xy_len >= 0.98, 0.0, jnp.sqrt(jnp.maximum(1.0 - xy_len, 0.0))
        ),
    ) * forward_scale

    n = jnp.stack([x_delta, y_delta, forward + forward_bias], axis=-1)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                1e-12))
    n = n / norm

    dead = (l <= 0.01) & (r <= 0.01) & (a <= 0.01) & (b <= 0.01)
    encoded = n * 0.5 + 0.5
    encoded = jnp.where(dead[..., None], 0.0, encoded)
    alpha = jnp.ones(encoded.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([encoded, alpha], axis=-1)
