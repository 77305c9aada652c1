"""Decompose the seg-path wave-bounce cost: mesh vs shadows vs base.

Renders prj8 variants at 400x300x4spp, bounces=4:
  full        — as-is (teapot mesh + 2 direct lights)
  no-shadow   — direct lights removed (ambient only): no anyhit sweeps
  no-mesh     — teapot removed: primitives only
Usage: python -m tools.profile_seg2
"""
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCENE_XML = "/root/reference/RayTracingProj8/RayTracingProj8/scene.xml"


def timed(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jnp.isfinite(out[0]).all())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import dataclasses

    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import render_device_host
    from rtf_tpu.scene import build_scene, load_scene

    cfg = dataclasses.replace(PROFILES["proj8"], min_samples=4,
                              max_samples=4, split_mode="rr", bounces=4)
    key = jax.random.PRNGKey(0)

    def bench(name, mutate):
        desc = load_scene(SCENE_XML)
        desc.camera.width, desc.camera.height = 400, 300
        mutate(desc)
        scene = build_scene(desc)
        dt = timed(lambda: render_device_host(scene, cfg, key))
        print(f"{name:12s}: {dt*1e3:8.1f} ms/frame")
        return dt

    full = bench("full", lambda d: None)

    def drop_lights(d):
        d.lights = [l for l in d.lights if l.kind == "ambient"]

    def drop_mesh(d):
        d.root.children = [n for n in d.root.children
                           if n.obj_kind != "mesh"]

    ns = bench("no-shadow", drop_lights)
    nm = bench("no-mesh", drop_mesh)
    print(f"shadow sweeps: {(full-ns)*1e3:.1f} ms; "
          f"mesh total: {(full-nm)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
