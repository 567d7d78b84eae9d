"""Distance-field sampling: the innermost primitive of every hot loop.

Port of sampleDistanceFieldEx (/root/reference/Illuminant/Shaders/
DistanceFieldCommon.fxh:313-353): clamp the query to the volume, take a
bilinear-XY + linear-Z (trilinear) sample, and add the euclidean distance
from the query to the volume so out-of-volume queries stay conservative.
The reference's 3-slices-per-RGBA-texel packing and atlas UV math
(fxh:303-311, 337-346) disappear — the field here is a plain (S, H, W)
array and Z interpolation indexes adjacent slices directly.

Also `estimate_normal`: 4-tap tetrahedral normal
(VisualizeCommon.fxh:44-63), used by particle SDF collision and field
visualization.

Everything is expressed over flat batches of query points so XLA lowers the
8 corner reads to vector gathers; the Pallas cone-trace kernel reimplements
this inline with the volume pinned in VMEM (lighting/pallas_trace.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .volume import SdfVolume


def _gather2d(data, si, yi, xi):
    """data (S, H, W); integer index arrays broadcastable to a common shape."""
    return data[si, yi, xi]


def sample(volume: SdfVolume, position):
    """Trilinear distance sample at world positions (..., 3) -> (...,)."""
    c = volume.config
    data = volume.data

    px = position[..., 0]
    py = position[..., 1]
    pz = position[..., 2] - c.z_offset

    ex = float(c.virtual_width)
    ey = float(c.virtual_height)
    ez = float(c.virtual_depth)

    cx = jnp.clip(px, 0.0, ex)
    cy = jnp.clip(py, 0.0, ey)
    cz = jnp.clip(pz, 0.0, ez)

    # Distance from the query to the volume AABB (fxh:320-321).
    dx = -jnp.minimum(px, 0.0) + jnp.maximum(px - ex, 0.0)
    dy = -jnp.minimum(py, 0.0) + jnp.maximum(py - ey, 0.0)
    dz = -jnp.minimum(pz, 0.0) + jnp.maximum(pz - ez, 0.0)
    distance_to_volume = jnp.sqrt(dx * dx + dy * dy + dz * dz)

    # Z -> slice space (fxh:325-327): slice s sits at z = s * sliceZSize.
    z_to_slice = c.slice_count / ez
    slice_pos = jnp.minimum(cz, volume.max_valid_z) * z_to_slice
    s0 = jnp.floor(slice_pos)
    sw = slice_pos - s0
    s0i = jnp.clip(s0.astype(jnp.int32), 0, c.slice_count - 1)
    s1i = jnp.clip(s0i + 1, 0, c.slice_count - 1)

    # XY -> texel space; texel centers at (i + 0.5) (GPU bilinear).
    tx = cx * c.scale_x - 0.5
    ty = cy * c.scale_y - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    wx = tx - x0
    wy = ty - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, c.slice_width - 1)
    x1i = jnp.clip(x0i + 1, 0, c.slice_width - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, c.slice_height - 1)
    y1i = jnp.clip(y0i + 1, 0, c.slice_height - 1)

    def bilinear(si):
        v00 = _gather2d(data, si, y0i, x0i)
        v01 = _gather2d(data, si, y0i, x1i)
        v10 = _gather2d(data, si, y1i, x0i)
        v11 = _gather2d(data, si, y1i, x1i)
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    a = bilinear(s0i)
    b = bilinear(s1i)
    d = a + (b - a) * sw

    return d + distance_to_volume


def sample_or_max(volume: SdfVolume | None, position, maximum_z: float = 128.0):
    """sampleDistanceField (fxh:355-364): no field -> max encoded distance."""
    if volume is None:
        return jnp.full(position.shape[:-1], maximum_z, dtype=jnp.float32)
    return sample(volume, position)


# Tetrahedral offsets k.xyy, k.yyx, k.yxy, k.xxx with k = (1, -1)
# (VisualizeCommon.fxh:44-45).
# numpy, not jnp: a module-level jnp constant created during a lazy
# import INSIDE a jit trace becomes a tracer of that trace and leaks
# into every later trace (UnexpectedTracerError).
_NORMAL_WEIGHTS = np.asarray(
    [
        [1.0, -1.0, -1.0],
        [-1.0, -1.0, 1.0],
        [-1.0, 1.0, -1.0],
        [1.0, 1.0, 1.0],
    ],
    dtype=np.float32,
)


def estimate_normal(volume: SdfVolume, position):
    """4-tap tetrahedral gradient estimate (VisualizeCommon.fxh:47-63).

    Tap offsets are one voxel in world units: (1/scale_x, 1/scale_y,
    slice_z_size) — the VISUALIZE_TEXEL default (VisualizeCommon.fxh:9-16).
    Returns unit normals (..., 3); zero-length gradients normalize to 0.
    """
    c = volume.config
    texel = jnp.asarray(
        [1.0 / c.scale_x, 1.0 / c.scale_y, c.slice_z_size],
        dtype=jnp.float32,
    )
    result = jnp.zeros(position.shape, dtype=jnp.float32)
    for i in range(4):
        w = _NORMAL_WEIGHTS[i]
        d = sample(volume, position + w * texel)
        result = result + w * d[..., None]
    norm = jnp.sqrt(jnp.sum(result * result, axis=-1, keepdims=True))
    return jnp.where(norm > 1e-9, result / jnp.maximum(norm, 1e-9), 0.0)
