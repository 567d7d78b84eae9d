"""Analytic SDF scene: gather-free distance queries.

The reference rasterizes obstructions into a 3D distance texture because GPU
texture fetches are nearly free (SDF/DistanceField.cs + DistanceFunction.fx).
On TPU the economics invert: random gathers serialize (~75M/s measured on
v5e) while dense vector math runs at TFLOP/s — so the TPU-native primary
path evaluates the analytic obstruction SDFs (ops/sdf_primitives, the same
formulas the rasterizer used) directly at every query point. The voxel
volume (volume.py/sampling.py) remains for polygonal height volumes,
precomputed/loaded fields, and reference-parity tests.

Obstructions are grouped BY TYPE at pack time (host side knows the types),
so a scene with only boxes pays only the box formula — the analog of the
reference's one-instanced-draw-per-type (LightingRenderer.DistanceField.cs:
347-399), which existed for the same reason.

Every query is exact (no voxel quantization, no slice interpolation, no
max-valid-z cap) — shadows and collisions from the analytic path are
sharper than the reference's rasterized-texture results at equal settings.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field
from ..ops import sdf_primitives as sp

_EVALUATORS = {
    sp.TYPE_ELLIPSOID: sp.sd_ellipsoid,
    sp.TYPE_BOX: sp.sd_box,
    sp.TYPE_CYLINDER: sp.sd_cylinder,
    sp.TYPE_SPHEROID: sp.sd_spheroid,
    sp.TYPE_OCTAGON: sp.sd_octagon,
}

_FAR = 1e9


@pytree_dataclass
class AnalyticScene:
    """Type-grouped obstruction SoA.

    groups: tuple of (type_id, has_rotation) static descriptors aligned
    with the centers/sizes/rotations tuples. Empty scene -> distance
    saturates at `maximum_distance` (the no-field behavior of
    sampleDistanceField, DistanceFieldCommon.fxh:355-364).
    """

    centers: Tuple[jnp.ndarray, ...]
    sizes: Tuple[jnp.ndarray, ...]
    rotations: Tuple[jnp.ndarray, ...]
    polygons: object = None  # Optional[sdf.height_volume.HeightVolumes]
    group_types: Tuple[int, ...] = static_field(default=())
    group_rotated: Tuple[bool, ...] = static_field(default=())
    maximum_distance: float = static_field(default=128.0)

    def distance(self, position):
        """Scene distance at (..., 3) points -> (...,). Min over all
        obstructions (== the reference's MAX blend over encoded distances,
        fxh:264-270) and extruded height-volume polygons."""
        d = jnp.full(position.shape[:-1], self.maximum_distance,
                     dtype=jnp.float32)
        for gi, type_id in enumerate(self.group_types):
            centers = self.centers[gi]  # (n, 3)
            sizes = self.sizes[gi]
            p = position[..., None, :] - centers
            if self.group_rotated[gi]:
                p = sp.rotate_by_quaternion(p, self.rotations[gi])
            dg = _EVALUATORS[type_id](p, sizes)
            d = jnp.minimum(d, jnp.min(dg, axis=-1))
        if self.polygons is not None:
            from .height_volume import extruded_polygon_distance

            d = jnp.minimum(
                d, extruded_polygon_distance(position, self.polygons)
            )
        return d

    def estimate_normal(self, position):
        """Exact field gradient via reverse-mode AD (~2 distance evals
        instead of the 4-tap tetrahedral stencil the texture path needs —
        the analytic field is differentiable, so VisualizeCommon.fxh's
        finite differences are unnecessary)."""
        import jax

        d, vjp = jax.vjp(self.distance, position)
        (grad,) = vjp(jnp.ones_like(d))
        norm = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
        return jnp.where(norm > 1e-9, grad / jnp.maximum(norm, 1e-9), 0.0)


_NORMAL_WEIGHTS = jnp.asarray(
    [[1.0, -1.0, -1.0], [-1.0, -1.0, 1.0], [-1.0, 1.0, -1.0],
     [1.0, 1.0, 1.0]],
    dtype=jnp.float32,
)


def _is_identity_rotation(q) -> bool:
    return abs(q[0]) < 1e-9 and abs(q[1]) < 1e-9 and abs(q[2]) < 1e-9


def pack_scene(obstructions: List, maximum_distance: float = 128.0,
               group_capacity_round: int = 2,
               height_volumes: Optional[List] = None) -> AnalyticScene:
    """Group host LightObstruction-likes (.type/.center/.size/.rotation)
    by type. Group sizes round up to `group_capacity_round` (padded with
    far-away unit boxes) so small scene edits reuse the jit cache.
    `height_volumes`: optional list of sdf.height_volume.HeightVolume
    (obstruction-flagged ones contribute extruded polygon SDFs)."""
    by_type: Dict[int, list] = {}
    for o in obstructions:
        if o.type == sp.TYPE_NONE:
            continue
        by_type.setdefault(o.type, []).append(o)

    centers, sizes, rotations = [], [], []
    group_types, group_rotated = [], []
    for type_id in sorted(by_type):
        group = by_type[type_id]
        n = len(group)
        cap = -(-n // group_capacity_round) * group_capacity_round
        c = np.full((cap, 3), _FAR, np.float32)
        s = np.ones((cap, 3), np.float32)
        r = np.zeros((cap, 4), np.float32)
        r[:, 3] = 1.0
        rotated = False
        for i, o in enumerate(group):
            c[i] = o.center
            s[i] = o.size
            r[i] = o.rotation
            rotated = rotated or not _is_identity_rotation(o.rotation)
        group_types.append(type_id)
        group_rotated.append(rotated)
        centers.append(jnp.asarray(c))
        sizes.append(jnp.asarray(s))
        rotations.append(jnp.asarray(r))

    polygons = None
    if height_volumes:
        from .height_volume import pack_height_volumes

        obstructing = [v for v in height_volumes if v.is_obstruction]
        if obstructing:
            polygons = pack_height_volumes(obstructing)

    return AnalyticScene(
        centers=tuple(centers),
        sizes=tuple(sizes),
        rotations=tuple(rotations),
        polygons=polygons,
        group_types=tuple(group_types),
        group_rotated=tuple(group_rotated),
        maximum_distance=maximum_distance,
    )


def scene_sample(field, position):
    """Uniform query interface: AnalyticScene, SdfVolume, or None."""
    if field is None:
        return jnp.full(position.shape[:-1], 128.0, dtype=jnp.float32)
    if isinstance(field, AnalyticScene):
        return field.distance(position)
    from .sampling import sample

    return sample(field, position)


def scene_normal(field, position):
    if isinstance(field, AnalyticScene):
        return field.estimate_normal(position)
    from .sampling import estimate_normal

    return estimate_normal(field, position)
