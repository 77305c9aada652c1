"""A/B the GI azimuth stratification (cfg.gi_stratify) on the real chip.

Runs the bench.py GI micro-config (box scene 400x300, 8 spp, 4
hemisphere samples) and a scene_b hybrid-GI frame with gi_stratify on/off
and prints steady frame times for each.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.cache  # noqa: F401

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def time_cfg(scene, cfg, reps=3, gi_grid=None):
    from rtf_tpu.render.renderer import render_device_host
    out = render_device_host(scene, cfg, jax.random.PRNGKey(0),
                             gi_grid=gi_grid)
    np.asarray(jnp.isfinite(out[0]).all())
    dt = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        out = render_device_host(scene, cfg, jax.random.PRNGKey(1 + rep),
                                 gi_grid=gi_grid)
        assert bool(np.asarray(jnp.isfinite(out[0]).all()))
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main():
    from rtf_tpu.render.config import RenderConfig
    from rtf_tpu.scene.build import build_scene
    from rtf_tpu.scene.procedural import box_scene

    scene = build_scene(box_scene(width=400, height=300, with_mesh=True))
    base = RenderConfig(min_samples=8, max_samples=8, bounces=2,
                        shadow_min=1, shadow_max=1,
                        gi_mode="hemisphere", hemisphere_samples=4,
                        queue_factor=1.0)
    for flag in (False, True):
        cfg = dataclasses.replace(base, gi_stratify=flag)
        dt = time_cfg(scene, cfg)
        print(f"gi micro (400x300 8spp 4hemi) gi_stratify={flag}: "
              f"{dt:.3f}s", flush=True)

    if os.environ.get("SCENEB", "1") != "1":
        return
    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import prepare_photon_grid
    from rtf_tpu.scene import load_scene
    from tools.flagship import SCENE_B
    os.chdir(os.path.dirname(SCENE_B) + "/..")
    desc = load_scene(SCENE_B)
    desc.camera.width, desc.camera.height = 800, 600
    sceneb = build_scene(desc)
    cfgb = PROFILES["final"].with_(
        split_mode="rr", min_samples=4, max_samples=4,
        hemisphere_samples=int(os.environ.get("HEMI", 8)))
    grid = prepare_photon_grid(sceneb, cfgb, jax.random.PRNGKey(7))
    for flag in (False, True):
        cfg = dataclasses.replace(cfgb, gi_stratify=flag)
        dt = time_cfg(sceneb, cfg, reps=2, gi_grid=grid)
        print(f"scene_b 800x600 4spp hemi={cfg.hemisphere_samples} "
              f"gi_stratify={flag}: {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
