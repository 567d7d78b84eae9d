"""Model -> live engine binding.

Port of /root/reference/Modeling/View.cs (ParticleEngineView): instantiates
a live ParticleSystem per SystemModel, maps TransformModel property bags
onto transform/spawner host objects, resolves named variables, and steps
everything in Update/Draw order. Property mapping is by name (the
reference uses reflection + TypeConverters, View.cs:199-264).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from ..particles import transforms as tx
from ..particles.formula import Formula1, Formula3, Formula4
from ..particles.spawner import Spawner
from ..particles.system import ParticleSystem, ParticleSystemConfig
from .model import EngineModel, SystemModel, TransformModel
from .parameter import Parameter, value_to_array


def _param_value(obj: Any, resolver, t: float = 0.0,
                 width: Optional[int] = None) -> np.ndarray:
    if obj is None:
        return np.zeros((width or 1,), np.float32)
    p = Parameter.from_json(obj) if not isinstance(obj, Parameter) else obj
    v = p.evaluate(t, resolver)
    return value_to_array(v, width)


def _formula3(obj: Any, resolver) -> Formula3:
    if not isinstance(obj, dict):
        return Formula3()
    ftype = int(obj.get("Type", 0)) if not isinstance(
        obj.get("Type"), str
    ) else {"Linear": 0, "Spherical": 1, "Towards": 2,
            "Rectangular": 3}.get(obj["Type"], 0)
    if obj.get("Circular"):
        ftype = max(ftype, 1)
    return Formula3(
        constant=tuple(_param_value(obj.get("Constant"), resolver, 0, 3)),
        random_scale=tuple(
            _param_value(obj.get("RandomScale"), resolver, 0, 3)
        ),
        offset=tuple(_param_value(obj.get("Offset"), resolver, 0, 3)),
        type=ftype,
    )


def _formula1(obj: Any, resolver) -> Formula1:
    if not isinstance(obj, dict):
        return Formula1()
    return Formula1(
        constant=float(_param_value(obj.get("Constant"), resolver, 0, 1)[0]),
        random_scale=float(
            _param_value(obj.get("RandomScale"), resolver, 0, 1)[0]
        ),
        offset=float(_param_value(obj.get("Offset"), resolver, 0, 1)[0]),
    )


def _formula4(obj: Any, resolver) -> Formula4:
    if not isinstance(obj, dict):
        return Formula4()
    return Formula4(
        constant=tuple(_param_value(obj.get("Constant"), resolver, 0, 4)),
        random_scale=tuple(
            _param_value(obj.get("RandomScale"), resolver, 0, 4)
        ),
        offset=tuple(_param_value(obj.get("Offset"), resolver, 0, 4)),
    )


def instantiate_transform(tm: TransformModel, resolver):
    """TransformModel -> live host transform (View.cs:199-264)."""
    p = tm.properties
    kind = tm.type
    if kind in ("Spawner", "PatternSpawner", "FeedbackSpawner"):
        s = Spawner(
            min_rate=float(_param_value(p.get("MinRate"), resolver, 0, 1)[0]),
            max_rate=float(_param_value(p.get("MaxRate"), resolver, 0, 1)[0]),
            life=_formula1(p.get("Life"), resolver),
            position=_formula3(p.get("Position"), resolver),
            velocity=_formula3(p.get("Velocity"), resolver),
            color=_formula4(p.get("Color") or p.get("Attributes"),
                            resolver),
            category=_formula1(p.get("Category"), resolver),
        )
        if p.get("MaximumTotal"):
            s.maximum_total = int(p["MaximumTotal"])
        if p.get("AdditionalPositions"):
            s.additional_positions = [
                tuple(value_to_array(v, 3))
                for v in p["AdditionalPositions"]
            ]
        return s
    if kind == "Gravity":
        attractors = []
        for a in p.get("Attractors", []) or []:
            attractors.append(
                tx.Attractor(
                    position=tuple(
                        _param_value(a.get("Position"), resolver, 0, 3)
                    ),
                    radius=float(
                        _param_value(a.get("Radius"), resolver, 0, 1)[0]
                    ),
                    strength=float(
                        _param_value(a.get("Strength"), resolver, 0, 1)[0]
                    ),
                    falloff_type={"Natural": 0, "Physical": 0, "Linear": 1,
                                  "Exponential": 2}.get(
                        str(a.get("FalloffType", "Linear")), 1
                    ),
                )
            )
        return tx.Gravity(
            attractors=attractors,
            maximum_acceleration=float(
                _param_value(p.get("MaximumAcceleration"), resolver, 0, 1)[0]
                or 1e6
            ),
        )
    if kind == "FMA":
        pos = p.get("Position") or {}
        vel = p.get("Velocity") or {}
        return tx.FMA(
            position_add=tuple(_param_value(pos.get("Add"), resolver, 0, 3)),
            position_multiply=tuple(
                _param_value(pos.get("Multiply"), resolver, 0, 3)
                if pos.get("Multiply") is not None else (1.0, 1.0, 1.0)
            ),
            velocity_add=tuple(_param_value(vel.get("Add"), resolver, 0, 3)),
            velocity_multiply=tuple(
                _param_value(vel.get("Multiply"), resolver, 0, 3)
                if vel.get("Multiply") is not None else (1.0, 1.0, 1.0)
            ),
            cycles_per_second=(
                float(p["CyclesPerSecond"])
                if p.get("CyclesPerSecond") is not None else None
            ),
        )
    if kind in ("Noise", "SpatialNoise"):
        n = tx.Noise(spatial=(kind == "SpatialNoise"))
        if p.get("Interval") is not None:
            n.interval_seconds = float(p["Interval"])
        for model_key, attr in (
            ("Position", "position"),
            ("Velocity", "velocity"),
        ):
            sub = p.get(model_key) or {}
            if sub.get("Offset") is not None:
                setattr(n, f"{attr}_offset",
                        tuple(_param_value(sub["Offset"], resolver, 0, 4)))
            if sub.get("Scale") is not None:
                setattr(n, f"{attr}_scale",
                        tuple(_param_value(sub["Scale"], resolver, 0, 4)))
        if p.get("ReplaceOldVelocity") is not None:
            n.replace_old_velocity = bool(p["ReplaceOldVelocity"])
        return n
    if kind in ("MatrixMultiply", "GeometricTransform"):
        return tx.MatrixMultiply()
    raise ValueError(f"unsupported transform type: {kind}")


def system_config_from_model(sm: SystemModel) -> ParticleSystemConfig:
    """ParticleSystemConfiguration subset (ParticleConfiguration.cs)."""
    c = sm.configuration or {}
    collision = c.get("Collision") or {}

    def f(key, default, src=c):
        v = src.get(key, default)
        if isinstance(v, dict):  # Parameter-wrapped
            return float(_param_value(v, None, 0, 1)[0])
        return float(v) if v is not None else default

    return ParticleSystemConfig(
        capacity=1 << 16,
        updates_per_second=f("UpdatesPerSecond", 60.0),
        friction=f("Friction", 0.0),
        maximum_velocity=f("MaximumVelocity", 16384.0),
        life_decay_per_second=f("LifeDecayPerSecond", 1.0),
        z_to_y=f("ZToY", 0.0),
        z_formula=(
            tuple(float(v) for v in
                  _param_value(c.get("ZFormula"), None, 0, 4))
            if c.get("ZFormula") is not None else None
        ),
        size_from_z=f("SizeFromZ", 0.0),
        collision_distance=f("Distance", 0.33, collision),
        collision_life_penalty=f("LifePenalty", 0.0, collision),
        escape_velocity=f("EscapeVelocity", 128.0, collision),
        bounce_velocity_multiplier=f(
            "BounceVelocityMultiplier", 0.0, collision
        ),
    )


@dataclasses.dataclass
class SystemView:
    model: SystemModel
    system: ParticleSystem


class EngineView:
    """ParticleEngineView (Modeling/View.cs:36-138)."""

    def __init__(self, model: EngineModel, volume=None,
                 overrides: Optional[Dict[str, Any]] = None,
                 capacity: Optional[int] = None):
        self.model = model
        self.resolver = model.make_resolver(overrides)
        self._overrides = overrides
        self._capacity = capacity
        self.systems: List[SystemView] = []
        for sm in sorted(model.systems, key=lambda s: s.update_order):
            config = system_config_from_model(sm)
            if capacity:
                config = dataclasses.replace(config, capacity=capacity)
            transforms = [
                instantiate_transform(t, self.resolver)
                for t in sm.transforms
            ]
            self.systems.append(
                SystemView(
                    model=sm,
                    system=ParticleSystem(config, transforms,
                                          volume=volume),
                )
            )

    def patch_system(self, sm: SystemModel) -> bool:
        """Re-derive a system's config + transforms from its (edited)
        model and apply them to the LIVE ParticleSystem without resetting
        its state (Modeling/View.cs:199-264 reflection-patch semantics).
        Returns False when the edit is structural (capacity / transform
        count changed) and the caller must rebuild instead."""
        for sv in self.systems:
            if sv.model is sm:
                config = system_config_from_model(sm)
                if self._capacity:
                    config = dataclasses.replace(
                        config, capacity=self._capacity)
                if config.capacity != sv.system.config.capacity:
                    return False
                if len(sm.transforms) != len(sv.system.transforms):
                    return False
                transforms = [
                    instantiate_transform(t, self.resolver)
                    for t in sm.transforms
                ]
                sv.system.patch(transforms=transforms, config=config)
                return True
        return False

    def refresh_variables(self,
                          overrides: Optional[Dict[str, Any]] = None
                          ) -> bool:
        """Named-variable change: rebuild the resolver and live-patch
        every system so transforms referencing the variable pick up the
        new value without a reset."""
        if overrides is not None:
            self._overrides = overrides
        self.resolver = self.model.make_resolver(self._overrides)
        return all(self.patch_system(sv.model) for sv in self.systems)

    def update(self, dt: float):
        for sv in self.systems:
            sv.system.update(dt)

    @property
    def live_count(self) -> int:
        return sum(sv.system.live_count for sv in self.systems)
