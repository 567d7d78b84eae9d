"""Spawn-value formulas.

Device side ports evaluateFormula + random normal generation
(/root/reference/Illuminant/Shaders/SpawnerCommon.fxh:34-104); host side
mirrors Formula1/3/4 (Illuminant/Formula.cs): value = Constant +
f(RandomScale, Offset, randomness) with types Linear / Spherical / Towards /
Rectangular.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

FORMULA_LINEAR = 0
FORMULA_SPHERICAL = 1
FORMULA_TOWARDS = 2
FORMULA_RECTANGULAR = 3

_SQRT2 = 1.41421356237


def generate_random_normal3(randomness_xy, axis_mask):
    """Sphere point picking (SpawnerCommon.fxh:47-57), axis-masked and
    normalized (fxh:72)."""
    phi = randomness_xy[..., 0] * (2.0 * jnp.pi)
    cos_theta = (randomness_xy[..., 1] - 0.5) * 2.0
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    n = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )
    n = n * axis_mask
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-12))
    return n / norm


def evaluate_formula(origin, constant, scale, offset, randomness, ftype,
                     axis_mask):
    """evaluateFormula (SpawnerCommon.fxh:59-104), branchless.

    origin/constant/scale/offset/randomness: (..., 4); ftype: scalar int;
    axis_mask: (3,). Returns (..., 4); .w is always the linear form
    (life/category channel).
    """
    non_circular = (randomness + offset) * scale
    type0 = constant + non_circular

    rn = generate_random_normal3(randomness[..., :2], axis_mask)
    circular = rn * randomness[..., 2:3] * scale[..., :3]

    # Spherical (fxh:85-88): radius offset along the normal.
    spherical = constant[..., :3] + circular + rn * offset[..., :3]

    # Rectangular (fxh:80-84): edge-clamped.
    edge = jnp.abs(offset[..., :3])
    rect = jnp.clip(offset[..., :3] * rn * _SQRT2, -edge, edge)
    rectangular = rect + constant[..., :3] + circular

    # Towards (fxh:91-100).
    to = constant[..., :3] - origin[..., :3]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to * to, axis=-1, keepdims=True),
                                1e-12))
    direction = to / dist
    towards = (
        randomness[..., 0:1] * scale[..., :3] * direction
        + offset[..., :3] * direction
    )
    towards = jnp.where(dist < 0.1, 0.0, towards)

    t = jnp.abs(jnp.floor(ftype)).astype(jnp.int32)
    xyz = jnp.where(
        t == FORMULA_SPHERICAL,
        spherical,
        jnp.where(
            t == FORMULA_RECTANGULAR,
            rectangular,
            jnp.where(t == FORMULA_TOWARDS, towards, type0[..., :3]),
        ),
    )
    w = jnp.where(
        t == FORMULA_TOWARDS,
        jnp.broadcast_to(constant[..., 3:4], type0[..., 3:4].shape),
        type0[..., 3:4],
    )
    return jnp.concatenate([xyz, w], axis=-1)


# ---- host-side formula configs (Formula.cs) ------------------------------


@dataclasses.dataclass
class Formula1:
    """Scalar spawn distribution (Formula.cs Formula1)."""

    constant: float = 0.0
    random_scale: float = 0.0
    offset: float = 0.0


@dataclasses.dataclass
class Formula3:
    """Vector3 spawn distribution."""

    constant: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    random_scale: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    type: int = FORMULA_LINEAR

    @staticmethod
    def unit_normal(scale=1.0):
        """Formula.cs UnitNormal preset: random unit vector * scale."""
        return Formula3(random_scale=(scale,) * 3, type=FORMULA_SPHERICAL)


@dataclasses.dataclass
class Formula4:
    """Vector4 spawn distribution (color)."""

    constant: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    random_scale: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    offset: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
