"""Lightmap resolve: HDR -> displayable image, optionally combined with
albedo.

Port of /root/reference/Illuminant/Shaders/Resolve.fx (all six variants:
{plain, gamma-compressed, tonemapped} x {with, without albedo}) and
ResolveLighting material selection (LightingRenderer.cs:1537-1645).

Reference convention note: scenes typically render lighting at
intensityScale = 1/2 into a HalfVector4 target, then resolve with
InverseScaleFactor = 2 (the albedo path even bakes in an extra x2,
Resolve.fx:56). Here the lightmap is full-intensity f32, so
`inverse_scale` defaults to 1 and the albedo combine applies the same
effective transfer: albedo -> lerp(albedo, albedo * light.rgb,
saturate(light.a)).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import (
    HDR_MODE_GAMMA_COMPRESS,
    HDR_MODE_NONE,
    HDR_MODE_TONEMAP,
    HDRConfig,
)
from ..ops import tonemap


def resolve(
    lightmap,
    hdr: HDRConfig = HDRConfig(),
    albedo=None,
    inverse_scale: float = 1.0,
    average_luminance: float = 0.5,
):
    """lightmap (H, W, 4) HDR -> (H, W, 4) display-linear (or sRGB) f32.

    `average_luminance` feeds gamma-compression (the reference computes it
    from the luminance-buffer histogram, LightingRenderer.HDR.cs).
    """
    light = lightmap * inverse_scale

    if albedo is not None:
        # ResolveWithAlbedoCommon (Resolve.fx:43-62).
        combined = jnp.concatenate(
            [
                albedo[..., :3]
                + (albedo[..., :3] * light[..., :3] - albedo[..., :3])
                * jnp.clip(light[..., 3:4], 0.0, 1.0),
                albedo[..., 3:4],
            ],
            axis=-1,
        )
        result = combined
    else:
        result = jnp.concatenate(
            [light[..., :3], jnp.ones_like(light[..., 3:4])], axis=-1
        )

    if hdr.mode == HDR_MODE_TONEMAP:
        # ToneMappedLightingResolve[WithAlbedo] (Resolve.fx:124-133).
        pre = jnp.maximum(result[..., :3] + hdr.offset, 0.0) * hdr.exposure
        mapped = tonemap.uncharted2_tonemap(pre) / jnp.maximum(
            tonemap.uncharted2_tonemap(
                jnp.asarray(hdr.white_point, jnp.float32)
            ),
            1e-6,
        )
        rgb = jnp.power(jnp.maximum(mapped, 0.0), hdr.gamma)
    elif hdr.mode == HDR_MODE_GAMMA_COMPRESS:
        compressed = tonemap.gamma_compress(
            result,
            hdr.offset,
            hdr.middle_gray,
            average_luminance,
            hdr.maximum_luminance_sq,
        )
        rgb = compressed[..., :3]
    else:
        assert hdr.mode == HDR_MODE_NONE
        rgb = jnp.maximum(result[..., :3] + hdr.offset, 0.0) * hdr.exposure
        rgb = jnp.power(jnp.maximum(rgb, 1e-12), hdr.gamma)

    if hdr.srgb_output:
        rgb = tonemap.linear_to_srgb(jnp.clip(rgb, 0.0, 1.0))

    if hdr.dithering:
        h, w = rgb.shape[:2]
        ys = jnp.arange(h)[:, None] * jnp.ones((1, w), jnp.int32)
        xs = jnp.arange(w)[None, :] * jnp.ones((h, 1), jnp.int32)
        rgb = tonemap.ordered_dither(rgb, ys, xs)

    return jnp.concatenate([rgb, result[..., 3:4]], axis=-1)


def to_uint8(image):
    """Quantize a resolved (H, W, C) f32 image to uint8 for display/IO."""
    return jnp.clip(jnp.round(image * 255.0), 0.0, 255.0).astype(jnp.uint8)


def hdr_bitmap(
    texture,
    hdr: HDRConfig = HDRConfig(),
    multiply_color=(1.0, 1.0, 1.0, 1.0),
    add_color=(0.0, 0.0, 0.0, 0.0),
    inverse_scale: float = 1.0,
    average_luminance: float = 0.5,
):
    """HDRBitmap.fx: tonemap/gamma-compress an arbitrary HDR bitmap (not
    the lightmap) with the standard multiply/add color combine.

    GammaCompressedPixelShader / ToneMappedPixelShader (HDRBitmap.fx:8-42):
    addColor premultiplies and applies scaled by result alpha; then the
    HDR.fxh operator selected by hdr.mode.
    """
    mul = jnp.asarray(multiply_color, jnp.float32)
    add = jnp.asarray(add_color, jnp.float32)
    add = add.at[:3].mul(add[3]).at[3].set(0.0)

    result = mul * (texture * inverse_scale)
    result = result + add * result[..., 3:4]

    if hdr.mode == HDR_MODE_TONEMAP:
        pre = jnp.maximum(result[..., :3] + hdr.offset, 0.0) * hdr.exposure
        mapped = tonemap.uncharted2_tonemap(pre) / jnp.maximum(
            tonemap.uncharted2_tonemap(
                jnp.asarray(hdr.white_point, jnp.float32)
            ),
            1e-6,
        )
        rgb = jnp.power(jnp.maximum(mapped, 1e-12), hdr.gamma)
    else:
        compressed = tonemap.gamma_compress(
            result, hdr.offset, hdr.middle_gray, average_luminance,
            hdr.maximum_luminance_sq,
        )
        rgb = compressed[..., :3]
    return jnp.concatenate([rgb, result[..., 3:4]], axis=-1)
