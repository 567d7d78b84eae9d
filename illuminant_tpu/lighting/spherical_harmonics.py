"""Spherical harmonics GI probes.

Port of the reference's latent GI surface: the 9-coefficient (l<=2) SH
basis and cosine-lobe convolution of
/root/reference/Illuminant/Shaders/SphericalHarmonics.fxh:1-89, and the
`GIProbe` host object (Lighting/LightProbe.cs:146-152). The reference
ships this disabled (no technique uses it in the snapshot); here the same
math is live: `project_radiance` builds an SH9Color from directional
radiance samples around a probe, `irradiance` evaluates the
cosine-convolved result for a surface normal — so GI probes can be baked
from any lightmap/light list and queried per pixel.

SH layout: an (9, 3) array — row r = coefficient r's rgb (the fxh's
SH9Color a..i fields).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

# SphericalHarmonics.fxh:3-6.
PI = 3.141592654
COSINE_A0 = PI
COSINE_A1 = (2.0 * PI) / 3.0
COSINE_A2 = PI * 0.25


@dataclasses.dataclass
class GIProbe:
    """Host GI probe (LightProbe.cs:146-152) + its baked coefficients."""

    position: Tuple[float, float, float]
    coefficients: object = None  # (9, 3) once baked


def sh9_basis(direction):
    """SHCosineLobe's basis rows (fxh:16-35) WITHOUT the cosine scale:
    direction (..., 3) -> (..., 9)."""
    x = direction[..., 0]
    y = direction[..., 1]
    z = direction[..., 2]
    return jnp.stack([
        jnp.broadcast_to(jnp.asarray(0.282095, jnp.float32), x.shape),
        0.488603 * y,
        0.488603 * z,
        0.488603 * x,
        1.092548 * x * y,
        1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], axis=-1)


_COSINE_SCALE = jnp.asarray(
    [COSINE_A0] + [COSINE_A1] * 3 + [COSINE_A2] * 5, jnp.float32
)


def sh_cosine_lobe(direction):
    """SHCosineLobe + SHScaleByCosine (fxh:16-49): (..., 9)."""
    return sh9_basis(direction) * _COSINE_SCALE


def project_radiance(directions, radiance):
    """Monte-Carlo SH projection (the SH9CAdd9 accumulation loop +
    SHScaleColorByCosine normalization, fxh:51-89): directions (N, 3)
    unit sample dirs, radiance (N, 3) incoming rgb along each ->
    SH9Color (9, 3), cosine-convolved and normalized so `irradiance`
    returns the diffuse irradiance/pi (the fxh pipeline's output
    convention)."""
    n = directions.shape[0]
    basis = sh9_basis(directions)  # (N, 9)
    coeffs = jnp.einsum("nk,nc->kc", basis, radiance) * (4.0 * PI / n)
    # SHScaleColorByCosine with divisor pi (irradiance -> radiance).
    return coeffs * (_COSINE_SCALE[:, None] / PI)


def irradiance(coefficients, normal):
    """SH9CSum9 (fxh:62-74): evaluate the SH9Color for surface normals.
    coefficients (9, 3); normal (..., 3) -> (..., 3)."""
    basis = sh9_basis(normal)  # (..., 9)
    return jnp.einsum("...k,kc->...c", basis, coefficients)


def fibonacci_sphere(n: int) -> np.ndarray:
    """Uniform unit-sphere sample directions for baking (host)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack([
        np.cos(theta) * np.sin(phi),
        np.sin(theta) * np.sin(phi),
        np.cos(phi),
    ], axis=-1).astype(np.float32)


def bake_probe_from_lights(probe_position, sample_radiance_fn,
                           n_samples: int = 128):
    """Bake a GI probe: sample incoming radiance in n directions around
    the probe (sample_radiance_fn(dirs (N,3)) -> (N,3) rgb) and project.
    Returns the (9, 3) SH9Color."""
    dirs = jnp.asarray(fibonacci_sphere(n_samples))
    rad = sample_radiance_fn(dirs)
    return project_radiance(dirs, rad)
