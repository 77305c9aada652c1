"""Decompose the scene_b hemisphere-GI cost: per-hemi-sample slope and
its split between mesh closest sweeps, shadow sweeps, and base wave.

The hybrid-GI frame is dominated by the hemisphere child waves
(fused_gi_chunks): incoherent directions defeat the per-lane slab tile
culls, so every MXU tile's matmul runs for almost every block.  This
tool measures where the time actually goes before we redesign.

Usage: python -m tools.profile_gi [--width 400 --height 300 --spp 4]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.cache  # noqa: F401

SCENE_B = ("/root/reference/RayTracingFinal/RayTracingFinal/"
           "data/scene_b.xml")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import render_device_host
    from rtf_tpu.scene import build_scene, load_scene

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    os.chdir(os.path.dirname(SCENE_B) + "/..")

    def timed(scene, cfg, reps=2):
        key = jax.random.PRNGKey(0)
        out = render_device_host(scene, cfg, key)
        np.asarray(jnp.isfinite(out[0]).all())
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            out = render_device_host(scene, cfg, jax.random.PRNGKey(r))
            np.asarray(jnp.isfinite(out[0]).all())
            best = min(best, time.perf_counter() - t0)
        return best

    def scene_variant(mutate=None):
        desc = load_scene(SCENE_B)
        desc.camera.width, desc.camera.height = args.width, args.height
        if mutate:
            mutate(desc)
        return build_scene(desc)

    def cfg_h(h):
        return PROFILES["final"].with_(
            split_mode="rr", min_samples=args.spp, max_samples=args.spp,
            bounces=args.bounces, gi_mode="hemisphere",
            hemisphere_samples=h)

    full = scene_variant()
    t0 = timed(full, cfg_h(0))
    t2 = timed(full, cfg_h(2))
    t4 = timed(full, cfg_h(4))
    slope = (t4 - t2) / 2
    print(f"hemi=0 {t0*1e3:8.1f} ms   hemi=2 {t2*1e3:8.1f} ms   "
          f"hemi=4 {t4*1e3:8.1f} ms   slope {slope*1e3:8.1f} ms/sample")

    def drop_lights(d):
        d.lights = [l for l in d.lights if l.kind == "ambient"]

    def drop_mesh(d):
        d.root.children = [n for n in d.root.children
                           if n.obj_kind != "mesh"]

    nl = scene_variant(drop_lights)
    t2n = timed(nl, cfg_h(2))
    t4n = timed(nl, cfg_h(4))
    print(f"no-lights slope {((t4n - t2n) / 2)*1e3:8.1f} ms/sample "
          f"(shadow sweeps = {(slope - (t4n - t2n) / 2)*1e3:.1f} ms)")

    nm = scene_variant(drop_mesh)
    t2m = timed(nm, cfg_h(2))
    t4m = timed(nm, cfg_h(4))
    print(f"no-mesh   slope {((t4m - t2m) / 2)*1e3:8.1f} ms/sample "
          f"(mesh total  = {(slope - (t4m - t2m) / 2)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
