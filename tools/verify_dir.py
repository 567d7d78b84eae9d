import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from illuminant_tpu.core.config import RendererConfig, QualitySettings
from illuminant_tpu.lighting.renderer import render_lightmap
from illuminant_tpu.lighting.environment import (
    EnvironmentUniforms, LightObstruction, pack_sphere_lights)
from illuminant_tpu.lighting.directional import (
    DirectionalLightSource, pack_directional_lights)
from illuminant_tpu.lighting.gbuffer import flat_ground
from illuminant_tpu.sdf.analytic import pack_scene

print("backend:", jax.default_backend())
H, W = 1080, 1920
scene = pack_scene([
    LightObstruction.box((500.0, 500.0, 20.0), (30.0, 90.0, 30.0)),
    LightObstruction.box((1200.0, 600.0, 20.0), (120.0, 25.0, 45.0)),
    LightObstruction.ellipsoid((900.0, 300.0, 25.0), (50.0, 50.0, 25.0)),
])
env = EnvironmentUniforms.make(ambient=(0.05, 0.05, 0.06, 1.0))
gb = flat_ground(H, W, env)
sph = pack_sphere_lights([], capacity=1)
dirl = pack_directional_lights([
    DirectionalLightSource(direction=(-0.8, -0.3, -0.45),
                           color=(1.0, 0.95, 0.85, 1.0),
                           shadow_trace_length=400.0, shadow_softness=10.0),
])
cfg = RendererConfig(quality=QualitySettings())

outs = {}
for mode in ("march", "scan"):
    f = jax.jit(lambda v, g, s, e, d: render_lightmap(
        v, g, s, e, cfg, directional_lights=d, shadow_mode=mode))
    lm = f(scene, gb, sph, env, dirl)
    np.asarray(lm[0, 0])  # fence
    t0 = time.perf_counter(); N = 30
    for _ in range(N):
        lm = f(scene, gb, sph, env, dirl)
    np.asarray(lm[0, 0])
    dt = (time.perf_counter() - t0) / N * 1e3 - 30.0 / N
    a = np.asarray(lm[..., 3], np.float32)
    outs[mode] = a
    sh = a[440:560, 330:450].mean(); lit = a[100:300, 1500:1800].mean()
    print(f"{mode}: {dt:.2f} ms/frame  shadow_mean={sh:.3f} lit_mean={lit:.3f}")

d = np.abs(outs["march"] - outs["scan"])
lvl = outs["march"][100:300, 1500:1800].mean()
cls = (outs["march"] > 0.5 * lvl) != (outs["scan"] > 0.5 * lvl)
print(f"mean_abs_diff={d.mean():.4f} classification_disagree={cls.mean():.4%}")
from PIL import Image
for mode, a in outs.items():
    Image.fromarray((np.clip(a - 1.0, 0, 1) * 255).astype(np.uint8)).save(
        f"out/verify_dir_{mode}.png")
print("saved")
