"""LightingRenderer: the host-side frame orchestrator.

Mirrors the public surface of the reference renderer
(/root/reference/Illuminant/Lighting/LightingRenderer.cs:434 — UpdateFields
:1949, RenderLighting :917, RenderedLighting.Resolve HDR.cs:99/128), but
the per-frame work is one jitted pure function instead of a deferred batch
graph: XLA fuses the field sampling, falloff, cone trace and accumulate.

Incremental SDF updates keep the reference's budget semantics
(MaximumFieldUpdatesPerFrame, Configuration.cs:87-91): host-side slice
validity tracking decides which Z-slabs to regenerate this frame; slab
regeneration and the write into the volume both happen on device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import HDRConfig, QualitySettings, RendererConfig
from ..raster.resolve import resolve as resolve_lightmap
from ..sdf import volume as vol
from ..sdf.volume import SdfObstructions, SdfVolume, SdfVolumeConfig
from . import gbuffer as gbuf
from .environment import (
    EnvironmentUniforms,
    LightingEnvironment,
    SphereLights,
    pack_sphere_lights,
    SphereLightSource,
)
from .sphere import accumulate_sphere_lights


@partial(
    jax.jit,
    static_argnames=("config", "with_specular", "shadow_mode", "with_ao"),
)
def render_lightmap(
    volume,
    gbuffer: gbuf.GBuffer,
    sphere_lights: SphereLights,
    env: EnvironmentUniforms,
    config: RendererConfig,
    directional_lights=None,
    line_lights=None,
    volumetric_lights=None,
    projector_lights=None,
    with_specular: bool = False,
    shadow_mode: str = "march",
    with_ao: bool = True,
):
    """The Light Pass (LightingRenderer.cs:1004-1168): clear to ambient,
    accumulate every light family additively -> (H, W, 4) HDR lightmap."""
    h, w = gbuffer.shape
    lightmap = jnp.broadcast_to(env.ambient, (h, w, 4)).astype(jnp.float32)
    lightmap = lightmap + accumulate_sphere_lights(
        volume, gbuffer, sphere_lights, env, config.quality,
        with_specular=with_specular, shadow_mode=shadow_mode,
        with_ao=with_ao,
    )
    if directional_lights is not None:
        from .directional import accumulate_directional_lights

        lightmap = lightmap + accumulate_directional_lights(
            volume, gbuffer, directional_lights, env, config.quality,
            shadow_mode=shadow_mode, with_ao=with_ao,
        )
    if line_lights is not None:
        from .line import accumulate_line_lights

        lightmap = lightmap + accumulate_line_lights(
            volume, gbuffer, line_lights, env, config.quality,
            shadow_mode=shadow_mode, with_ao=with_ao,
        )
    if volumetric_lights is not None:
        from .volumetric import accumulate_volumetric_lights

        lightmap = lightmap + accumulate_volumetric_lights(
            volume, gbuffer, volumetric_lights, env, config.quality,
            # Forward the pass's shadow setting (per-light CastsShadows
            # gating happens inside — lights with the flag off keep
            # full visibility even in a shadowed pass).
            shadowed=(shadow_mode != "none"),
            shadow_detail="scan" if shadow_mode == "scan" else "march",
        )
    if projector_lights is not None:
        from .projector import accumulate_projector_lights

        lightmap = lightmap + accumulate_projector_lights(
            volume, gbuffer, projector_lights, env, config.quality
        )
    return lightmap


# Slab starts cycle over a small fixed set, so the per-(start, count)
# compilation cache stays tiny.
_generate_slab_jit = jax.jit(
    vol.generate_slab, static_argnames=("config", "slice_start", "slice_count")
)
_update_slices_jit = jax.jit(vol.update_slices, donate_argnums=(0,))


class LightingRenderer:
    """Host wrapper owning the field, g-buffer, and packed scene arrays."""

    def __init__(
        self,
        config: RendererConfig,
        environment: LightingEnvironment,
        sdf_config: Optional[SdfVolumeConfig] = None,
        light_capacity: int = 64,
        obstruction_capacity: int = 64,
    ):
        self.config = config
        self.environment = environment
        self.light_capacity = light_capacity
        self.obstruction_capacity = obstruction_capacity
        self.sdf_config = sdf_config
        # Static/dynamic field partition (DynamicDistanceField,
        # SDF/DistanceField.cs:248-321): the static partition holds
        # non-dynamic obstructions and is not re-rasterized when dynamic
        # ones move. `self.volume` is the combined (minimum) field.
        self.volume: Optional[SdfVolume] = (
            SdfVolume.empty(sdf_config) if sdf_config else None
        )
        self._volume_static: Optional[SdfVolume] = (
            SdfVolume.empty(sdf_config) if sdf_config else None
        )
        self._volume_dynamic: Optional[SdfVolume] = (
            SdfVolume.empty(sdf_config) if sdf_config else None
        )
        # All slices start invalid (DistanceField.cs:13-16).
        all_slices = list(range(sdf_config.slice_count)) if sdf_config else []
        self._invalid_static = list(all_slices)
        self._invalid_dynamic = list(all_slices)
        self._obstruction_snapshot = ()
        self.gbuffer: Optional[gbuf.GBuffer] = None
        # OnRenderGBuffer analog (LightingRenderer.GBuffer.cs:173-198):
        # user callbacks invoked after the built-in G-buffer passes, each
        # receiving the GBuffer and returning a (possibly modified) one —
        # the functional form of the ImperativeRenderer draw hook (use
        # e.g. billboard.rasterize_billboards with TYPE_AUTO sprites).
        self.on_render_gbuffer = []

    # -- field generation (UpdateFields, LightingRenderer.cs:1949) --------

    @property
    def _invalid_slices(self):
        """Back-compat view: union of both partitions' invalid slices."""
        return sorted(set(self._invalid_static) | set(self._invalid_dynamic))

    def invalidate(self, static: bool = True):
        """Full invalidation (DistanceField.Invalidate; the `static` flag
        mirrors DynamicDistanceField.Invalidate(false) = dynamic only)."""
        if self.sdf_config:
            all_slices = list(range(self.sdf_config.slice_count))
            self._invalid_dynamic = list(all_slices)
            if static:
                self._invalid_static = list(all_slices)

    def auto_invalidate(self):
        """AutoInvalidateDistanceField (LightingRenderer.cs:1977-2015):
        consume obstruction dirty flags. A mutated dynamic obstruction
        invalidates only the dynamic partition; a mutated static one (or a
        dynamicity flip, or list add/remove) invalidates both."""
        if self.sdf_config is None:
            return
        snapshot = (
            tuple(o.serial for o in self.environment.obstructions
                  if not o.is_dynamic),
            tuple(o.serial for o in self.environment.obstructions
                  if o.is_dynamic),
        )
        invalidated_static = invalidated_dynamic = False
        if snapshot != self._obstruction_snapshot:
            # Added/removed obstructions: IsInvalid(Dynamic) collection
            # flags (LightingEnvironment.cs:51-133).
            static_changed = snapshot[0] != self._obstruction_snapshot[0] \
                if self._obstruction_snapshot else True
            self._obstruction_snapshot = snapshot
            self.invalidate(static=static_changed)
            invalidated_dynamic = True
            invalidated_static = static_changed
        for o in self.environment.obstructions:
            if getattr(o, "has_dynamicity_changed", False):
                object.__setattr__(o, "has_dynamicity_changed", False)
                if not invalidated_static:
                    self.invalidate(static=True)
                    invalidated_static = invalidated_dynamic = True
            if not getattr(o, "is_valid", True):
                object.__setattr__(o, "is_valid", True)
                if o.is_dynamic:
                    if not invalidated_dynamic:
                        self.invalidate(static=False)
                        invalidated_dynamic = True
                elif not invalidated_static:
                    self.invalidate(static=True)
                    invalidated_static = invalidated_dynamic = True

    def update_fields(self, budget: Optional[int] = None):
        env_u = self.environment.uniforms()
        h, w = self.config.lightmap_shape

        if self.config.enable_gbuffer:
            self.gbuffer = gbuf.flat_ground(
                h, w, env_u, self.config.render_scale
            )
            if self.environment.height_volumes and self.config.two_point_five_d:
                from ..sdf.height_volume import pack_height_volumes
                from .height_volume import rasterize_height_volumes

                packed = pack_height_volumes(
                    self.environment.height_volumes
                )
                self.gbuffer = rasterize_height_volumes(
                    self.gbuffer, packed, env_u
                )
            if self.environment.billboards:
                from .billboard import rasterize_billboards

                self.gbuffer = rasterize_billboards(
                    self.gbuffer, self.environment.billboards, env_u
                )
            for hook in self.on_render_gbuffer:
                self.gbuffer = hook(self.gbuffer, env_u)
        else:
            self.gbuffer = gbuf.no_gbuffer(
                h, w, env_u, self.config.render_scale
            )

        if self.sdf_config is None:
            return

        self.auto_invalidate()
        budget = budget or self.config.maximum_field_updates_per_frame
        has_dynamic = any(
            o.is_dynamic for o in self.environment.obstructions
        )
        if has_dynamic:
            self._volume_static, self._invalid_static = \
                self._regenerate_partition(
                    self._volume_static, self._invalid_static, budget,
                    dynamic=False)
            self._volume_dynamic, self._invalid_dynamic = \
                self._regenerate_partition(
                    self._volume_dynamic, self._invalid_dynamic, budget,
                    dynamic=True)
            self.volume = vol.combine_static_dynamic(
                self._volume_static, self._volume_dynamic
            )
        else:
            self._volume_static, self._invalid_static = \
                self._regenerate_partition(
                    self._volume_static, self._invalid_static, budget,
                    dynamic=None)
            self._invalid_dynamic = []
            self.volume = self._volume_static

    def _regenerate_partition(self, volume, invalid, budget, dynamic):
        """Budgeted slab regeneration of one partition
        (RenderDistanceFieldPartition, LightingRenderer.DistanceField.cs:
        415-462). `dynamic=None` = single-field mode (all obstructions)."""
        # The reference regenerates 3 virtual slices per physical update
        # (PackedSliceCount, LightingRenderer.cs:313); same granularity so
        # budgets mean the same thing.
        slices_per_update = 3
        if not invalid:
            return volume, invalid
        obstructions = self.environment.pack_obstructions(
            capacity=self.obstruction_capacity, dynamic=dynamic
        )
        for _ in range(budget):
            if not invalid:
                break
            start = invalid[0]
            count = min(
                slices_per_update, self.sdf_config.slice_count - start
            )
            slab = _generate_slab_jit(
                self.sdf_config, obstructions, start, count
            )
            volume = _update_slices_jit(volume, start, slab)
            done = set(range(start, start + count))
            invalid = [s for s in invalid if s not in done]
        valid_z = 0.0
        for s in range(self.sdf_config.slice_count):
            if s in invalid:
                break
            valid_z = (s + 1) * self.sdf_config.slice_z_size
        volume = volume.replace(
            max_valid_z=jnp.asarray(valid_z, jnp.float32)
        )
        return volume, invalid

    # -- lighting ---------------------------------------------------------

    def render_lighting(self, intensity_scale: float = 1.0,
                        shadow_mode: str = "march"):
        from .directional import (
            DirectionalLightSource,
            pack_directional_lights,
        )

        if self.gbuffer is None:
            self.update_fields(budget=10**6)
        from .environment import LightSourceReplicator

        sphere_sources = [
            l for l in self.environment.lights
            if isinstance(l, SphereLightSource)
        ]
        for rep in self.environment.lights:
            if isinstance(rep, LightSourceReplicator):
                sphere_sources += rep.expand()
        from .line import LineLightSource, pack_line_lights
        from .volumetric import (
            VolumetricLightSource,
            pack_volumetric_lights,
        )
        from .projector import ProjectorLightSource, pack_projector_lights

        field = self.volume
        if shadow_mode == "scan" or field is None:
            from ..sdf.analytic import pack_scene

            field = pack_scene(
                self.environment.obstructions,
                height_volumes=self.environment.height_volumes,
            )

        def mode_of(light):
            mode = getattr(light, "blend_mode", "additive")
            if mode not in ("additive", "subtractive", "max"):
                raise ValueError(
                    f"unknown blend_mode {mode!r} on {type(light).__name__}"
                    " (expected 'additive', 'subtractive' or 'max')")
            return mode

        def group_of(mode):
            """All lights of `mode`, spheres (incl. replicator
            expansions) first."""
            spheres = [s for s in sphere_sources if mode_of(s) == mode]
            rest = [
                l for l in self.environment.lights
                if isinstance(l, (DirectionalLightSource, LineLightSource,
                                  VolumetricLightSource,
                                  ProjectorLightSource))
                and mode_of(l) == mode
            ]
            return spheres + rest

        def light_pass(lights, env_u, additive=False):
            """One blend group's full light pass (the reference batches
            lights into render states keyed by BlendState and draws
            same-blend groups together, LightingRenderer.cs:48-96,206)."""
            spheres = [l for l in lights
                       if isinstance(l, SphereLightSource)]
            directional = [l for l in lights
                           if isinstance(l, DirectionalLightSource)]
            line = [l for l in lights if isinstance(l, LineLightSource)]
            volumetric = [l for l in lights
                          if isinstance(l, VolumetricLightSource)]
            projector = [l for l in lights
                         if isinstance(l, ProjectorLightSource)]
            # Capacity floored at light_capacity for EVERY group so a
            # changing group size never recompiles the jitted pass.
            cap = max(self.light_capacity, len(spheres))
            # A fully shadowless group skips the fixed-shape scan/march
            # work statically (the accumulators run it even when every
            # per-light cast flag is false).
            group_mode = shadow_mode if any(
                getattr(l, "cast_shadows", False) for l in lights
            ) else "none"
            return render_lightmap(
                field,
                self.gbuffer,
                pack_sphere_lights(spheres, capacity=cap),
                env_u,
                self.config,
                directional_lights=(pack_directional_lights(directional)
                                    if directional else None),
                line_lights=pack_line_lights(line) if line else None,
                volumetric_lights=(pack_volumetric_lights(volumetric)
                                   if volumetric else None),
                projector_lights=(pack_projector_lights(projector)
                                  if projector else None),
                shadow_mode=group_mode,
                # AO gate spans the whole group: line/directional
                # accumulators take the same static skip as spheres.
                with_ao=any(
                    getattr(l, "ambient_occlusion_radius", 0) > 0
                    for l in lights
                ),
            )

        env_u = self.environment.uniforms()
        # Ambient clears only the base (additive) pass; the subtractive
        # and max groups composite pure light contributions.
        env_zero = env_u.replace(
            ambient=jnp.zeros_like(jnp.asarray(env_u.ambient)))
        lightmap = light_pass(group_of("additive"), env_u, additive=True)
        sub_group = group_of("subtractive")
        if sub_group:
            # Subtraction is linear, so the whole group runs as ONE
            # pass. Float lightmap targets do not clamp GPU subtractive
            # blends (HalfVector4 in the reference); the resolve clamps.
            lightmap = lightmap - light_pass(sub_group, env_zero)
        # MaxBlendValue applies PER DRAW (each light maxes against the
        # current target), so max lights compose max-of-each, never a
        # group sum — one pass per max light (rare; typically one).
        for mx_light in group_of("max"):
            lightmap = jnp.maximum(
                lightmap, light_pass([mx_light], env_zero))
        if intensity_scale != 1.0:
            lightmap = lightmap * intensity_scale
        return lightmap

    def resolve(self, lightmap, hdr: HDRConfig = HDRConfig(), albedo=None,
                inverse_scale: float = 1.0,
                average_luminance: float = 0.5,
                albedo_is_srgb: bool = False):
        return resolve_lightmap(
            lightmap, hdr, albedo=albedo, inverse_scale=inverse_scale,
            average_luminance=average_luminance,
            albedo_is_srgb=albedo_is_srgb,
        )
