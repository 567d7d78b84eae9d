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


def _uncharted2_resolve(rgb, hdr: HDRConfig, floor: float = 0.0):
    """Shared ToneMapped operator: offset -> exposure -> Uncharted2 ->
    white-point normalize -> gamma (Resolve.fx:124-133 / HDRBitmap.fx).
    One implementation so curve/guard fixes cannot drift between the
    lightmap and bitmap paths."""
    pre = jnp.maximum(rgb + hdr.offset, 0.0) * hdr.exposure
    mapped = tonemap.uncharted2_tonemap(pre) / jnp.maximum(
        tonemap.uncharted2_tonemap(
            jnp.asarray(hdr.white_point, jnp.float32)
        ),
        1e-6,
    )
    return jnp.power(jnp.maximum(mapped, floor), hdr.gamma)


def _apply_mode(result, hdr: HDRConfig, average_luminance):
    if hdr.mode == HDR_MODE_TONEMAP:
        return _uncharted2_resolve(result[..., :3], hdr)
    if hdr.mode == HDR_MODE_GAMMA_COMPRESS:
        compressed = tonemap.gamma_compress(
            result,
            hdr.offset,
            hdr.middle_gray,
            average_luminance,
            hdr.maximum_luminance_sq,
        )
        return compressed[..., :3]
    assert hdr.mode == HDR_MODE_NONE, hdr.mode
    rgb = jnp.maximum(result[..., :3] + hdr.offset, 0.0) * hdr.exposure
    return jnp.power(jnp.maximum(rgb, 1e-12), hdr.gamma)


def _srgb_premultiplied(rgb, alpha):
    """pLinearToPSRGB: un-premultiply, apply the sRGB OETF, re-premultiply
    (the p-prefix convention — applying the OETF to premultiplied values
    brightens translucent pixels)."""
    a = jnp.maximum(alpha, 1e-6)
    straight = jnp.clip(rgb / a, 0.0, 1.0)
    return tonemap.linear_to_srgb(straight) * jnp.clip(alpha, 0.0, 1.0)


def _dither(rgb):
    h, w = rgb.shape[:2]
    # Broadcast index vectors — ordered_dither's advanced indexing
    # broadcasts (h, 1) x (1, w) itself.
    return tonemap.ordered_dither(
        rgb, jnp.arange(h)[:, None], jnp.arange(w)[None, :])


def resolve(
    lightmap,
    hdr: HDRConfig = HDRConfig(),
    albedo=None,
    inverse_scale: float = 1.0,
    average_luminance: float = 0.5,
    albedo_is_srgb: bool = False,
):
    """lightmap (H, W, 4) HDR -> (H, W, 4) display-linear (or sRGB) f32.

    `average_luminance` feeds gamma-compression (the reference computes it
    from the luminance-buffer histogram, LightingRenderer.HDR.cs).
    `albedo_is_srgb` linearizes an sRGB-authored albedo before the light
    combine (AlbedoIsSRGB, Resolve.fx:52-53).
    """
    light = lightmap * inverse_scale

    if albedo is not None:
        if albedo.shape[-1] < 4:
            # A 3-channel albedo is opaque; pad alpha = 1 so the output
            # contract ((H, W, 4)) holds instead of silently shrinking.
            albedo = jnp.concatenate(
                [albedo, jnp.ones_like(albedo[..., :1])], axis=-1)
        if albedo_is_srgb:
            # pSRGBToPLinear on the premultiplied albedo (fx:52-53).
            a = jnp.maximum(albedo[..., 3:4], 1e-6)
            lin = tonemap.srgb_to_linear(
                jnp.clip(albedo[..., :3] / a, 0.0, 1.0)) * a
            albedo = jnp.concatenate([lin, albedo[..., 3:4]], axis=-1)
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

    rgb = _apply_mode(result, hdr, average_luminance)

    if hdr.srgb_output:
        # Premultiplied convention (pLinearToPSRGB): translucent albedo
        # pixels must un-premultiply before the OETF.
        rgb = _srgb_premultiplied(jnp.clip(rgb, 0.0, 1.0),
                                  result[..., 3:4])

    if hdr.dithering:
        rgb = _dither(rgb)

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
    operator selected by hdr.mode — HDR_MODE_NONE is the plain
    exposure/gamma pass (the reference only ships the compressed/
    tonemapped materials; NONE here matches resolve()'s plain path
    instead of silently gamma-compressing). srgb_output/dithering are
    honored like resolve().
    """
    mul = jnp.asarray(multiply_color, jnp.float32)
    add = jnp.asarray(add_color, jnp.float32)
    add = add.at[:3].mul(add[3]).at[3].set(0.0)

    result = mul * (texture * inverse_scale)
    result = result + add * result[..., 3:4]

    rgb = _apply_mode(result, hdr, average_luminance)
    if hdr.srgb_output:
        rgb = _srgb_premultiplied(jnp.clip(rgb, 0.0, 1.0),
                                  result[..., 3:4])
    if hdr.dithering:
        rgb = _dither(rgb)
    return jnp.concatenate([rgb, result[..., 3:4]], axis=-1)
