"""HDR tonemapping / gamma-compression operators.

Ports the math of /root/reference/Illuminant/Shaders/HDR.fxh (GammaCompress
:11-18, Uncharted2 operator :24-45) and the resolve-side exposure/gamma and
dithering behavior of Resolve.fx. These are pure elementwise ops that XLA
fuses straight into the resolve pass — no separate "material" machinery.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Rec.601 luma weights (HDR.fxh:9).
# numpy, not jnp: module-level jnp constants become leaked tracers if the
# module is first imported inside a jit trace.
RGB_TO_LUMINANCE = np.asarray([0.299, 0.587, 0.114], dtype=np.float32)

# Uncharted2 curve constants (HDR.fxh:24-29).
_KA, _KB, _KC, _KD, _KE, _KF = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30


def luminance(rgb):
    """(..., 3) -> (...,) luma."""
    return jnp.einsum("...c,c->...", rgb, RGB_TO_LUMINANCE)


def uncharted2_tonemap(rgb):
    """Filmic curve (HDR.fxh:31-45); apply to exposure-scaled linear RGB."""
    v = rgb
    return (
        (v * (_KA * v + _KC * _KB) + _KD * _KE)
        / (v * (_KA * v + _KB) + _KD * _KF)
    ) - _KE / _KF


def uncharted2_resolve(rgba, exposure, white_point):
    """Full tonemap resolve: exposure, curve, white-point normalize.

    Matches Resolve.fx ToneMappedResolveCommon usage of HDR.fxh.
    """
    rgb = rgba[..., :3] * exposure
    mapped = uncharted2_tonemap(rgb)
    white = uncharted2_tonemap(jnp.asarray(white_point, dtype=jnp.float32))
    out = mapped / jnp.maximum(white, 1e-6)
    return jnp.concatenate([out, rgba[..., 3:4]], axis=-1)


def gamma_compress(
    rgba, offset, middle_gray, average_luminance, maximum_luminance_sq
):
    """Reinhard-style luminance compression (HDR.fxh:11-18)."""
    rgb = jnp.maximum(rgba[..., :3] + offset, 0.0)
    lum = luminance(rgb)
    scaled = (lum * middle_gray) / jnp.maximum(average_luminance, 1e-6)
    compressed = (scaled * (1.0 + scaled / maximum_luminance_sq)) / (
        1.0 + scaled
    )
    rescale = compressed / jnp.maximum(lum, 1e-6)
    return jnp.concatenate(
        [rgb * rescale[..., None], rgba[..., 3:4]], axis=-1
    )


def apply_exposure_gamma(rgba, exposure, gamma):
    """Exposure multiply + power gamma (Resolve.fx exposure/gamma uniforms)."""
    rgb = jnp.maximum(rgba[..., :3] * exposure, 0.0)
    rgb = jnp.power(rgb, gamma)
    return jnp.concatenate([rgb, rgba[..., 3:4]], axis=-1)


def srgb_to_linear(rgb):
    """Inverse sRGB OETF (pSRGBToPLinear's per-channel core)."""
    lo = rgb / 12.92
    hi = jnp.power((rgb + 0.055) / 1.055, 2.4)
    return jnp.where(rgb <= 0.04045, lo, hi)


def linear_to_srgb(rgb):
    """sRGB OETF (Resolve.fx sRGB output path)."""
    low = rgb * 12.92
    high = 1.055 * jnp.power(jnp.maximum(rgb, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(rgb <= 0.0031308, low, high)


def ordered_dither(rgb, pixel_y, pixel_x, strength=1.0 / 255.0):
    """4x4 Bayer ordered dithering (stands in for Fracture's DitherCommon).

    The reference dithers during resolve to hide banding in 8-bit output;
    a Bayer matrix is the standard deterministic equivalent.
    """
    bayer = (
        jnp.asarray(
            [
                [0, 8, 2, 10],
                [12, 4, 14, 6],
                [3, 11, 1, 9],
                [15, 7, 13, 5],
            ],
            dtype=jnp.float32,
        )
        / 16.0
        - 0.5
    )
    offs = bayer[pixel_y % 4, pixel_x % 4]
    return rgb + offs[..., None] * strength
