"""Flagship demos on real TPU hardware.

    python -m tools.flagship sceneb   [--width 800 --height 600 --spp 4]
    python -m tools.flagship caustics

sceneb: the Final box scene (meshes + MTL submaterials + file textures
+ 2 point lights) under the `final` hybrid-GI profile — photon pass,
irradiance volume, segmented fused kernels, hemisphere fan-out.
caustics: glass/mirror spheres with a caustic photon volume at
camera-visible hits.  Outputs land in artifacts/.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import tools.cache  # noqa: F401  (persistent XLA compile cache)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _retry(fn, tries=3, wait=90):
    """The tunneled backend's compile service occasionally drops the
    connection mid-compile; retry transient runtime errors."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception:
            if attempt == tries - 1:
                raise
            time.sleep(wait)
SCENE_B = ("/root/reference/RayTracingFinal/RayTracingFinal/"
           "data/scene_b.xml")


def sceneb(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import (
        finalize, prepare_photon_grid, render_device_host)
    from rtf_tpu.scene import build_scene, load_scene
    from rtf_tpu.utils.png import write_png

    os.chdir(os.path.dirname(SCENE_B) + "/..")
    desc = load_scene(SCENE_B)
    desc.camera.width, desc.camera.height = args.width, args.height
    scene = build_scene(desc)
    cfg = PROFILES["final"].with_(
        split_mode="rr", min_samples=args.spp, max_samples=args.spp,
        hemisphere_samples=args.hemi, photon_count=args.photons)
    t0 = time.perf_counter()
    grid = _retry(lambda: prepare_photon_grid(scene, cfg,
                                              jax.random.PRNGKey(7)))
    print(f"photon pass: {int(grid.n_valid)} in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = _retry(lambda: render_device_host(scene, cfg,
                                            jax.random.PRNGKey(0),
                                            gi_grid=grid))
    assert bool(np.asarray(jnp.isfinite(out[0]).all()))
    print(f"first frame (compile+volume+run): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = render_device_host(scene, cfg, jax.random.PRNGKey(1),
                             gi_grid=grid)
    np.asarray(out[0]).mean()
    print(f"steady frame: {time.perf_counter()-t0:.1f}s", flush=True)
    res = finalize(scene, cfg, *out)
    path = os.path.join(REPO, "artifacts",
                        f"sceneb_final_{args.width}x{args.height}.png")
    write_png(path, res.image)
    print(f"wrote {path}")


def sceneb_frame_time(width=800, height=600, spp=4, hemi=8,
                      photons=1_000_000) -> float:
    """Steady-state scene_b hybrid-GI frame time in seconds (the
    bench.py `sceneb_hybrid_gi_frame_time_s_800x600` extra).  Same
    pipeline as `sceneb` minus the PNG artifact; restores cwd."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import (
        prepare_photon_grid, render_device_host)
    from rtf_tpu.scene import build_scene, load_scene

    cwd = os.getcwd()
    try:
        os.chdir(os.path.dirname(SCENE_B) + "/..")
        desc = load_scene(SCENE_B)
        desc.camera.width, desc.camera.height = width, height
        scene = build_scene(desc)
        cfg = PROFILES["final"].with_(
            split_mode="rr", min_samples=spp, max_samples=spp,
            hemisphere_samples=hemi, photon_count=photons)
        grid = prepare_photon_grid(scene, cfg, jax.random.PRNGKey(7))
        out = render_device_host(scene, cfg, jax.random.PRNGKey(0),
                                 gi_grid=grid)  # compile + volume build
        np.asarray(jnp.isfinite(out[0]).all())
        t0 = time.perf_counter()
        out = render_device_host(scene, cfg, jax.random.PRNGKey(1),
                                 gi_grid=grid)
        assert bool(np.asarray(jnp.isfinite(out[0]).all()))
        return round(time.perf_counter() - t0, 3)
    finally:
        os.chdir(cwd)


def caustics(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rtf_tpu.render.config import RenderConfig
    from rtf_tpu.render.renderer import (
        finalize, prepare_caustic_grid, render_device_host)
    from rtf_tpu.scene.build import build_scene
    from rtf_tpu.scene.procedural import box_scene
    from rtf_tpu.utils.png import write_png

    scene = build_scene(box_scene(width=args.width, height=args.height,
                                  with_mesh=False))
    cfg = RenderConfig(min_samples=args.spp, max_samples=args.spp,
                       bounces=3, shadow_min=1, shadow_max=1,
                       gi_mode="none", split_mode="rr",
                       caustic_count=args.photons, caustic_bounces=5,
                       caustic_radius=1.0, knn_k=200)
    t0 = time.perf_counter()
    cg = prepare_caustic_grid(scene, cfg, jax.random.PRNGKey(3))
    print(f"caustic photons: {int(cg.n_valid)} in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    out = render_device_host(scene, cfg, jax.random.PRNGKey(0),
                             caustic_grid=cg)
    assert bool(np.asarray(jnp.isfinite(out[0]).all()))
    t0 = time.perf_counter()
    out = render_device_host(scene, cfg, jax.random.PRNGKey(1),
                             caustic_grid=cg)
    np.asarray(out[0]).mean()
    print(f"steady frame: {time.perf_counter()-t0:.2f}s", flush=True)
    res = finalize(scene, cfg, *out)
    path = os.path.join(REPO, "artifacts", "caustics_fused.png")
    write_png(path, res.image)
    print(f"wrote {path}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="flagship", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("sceneb")
    b.add_argument("--width", type=int, default=800)
    b.add_argument("--height", type=int, default=600)
    b.add_argument("--spp", type=int, default=4)
    b.add_argument("--hemi", type=int, default=8)
    b.add_argument("--photons", type=int, default=1_000_000)
    b.set_defaults(fn=sceneb)
    c = sub.add_parser("caustics")
    c.add_argument("--width", type=int, default=400)
    c.add_argument("--height", type=int, default=300)
    c.add_argument("--spp", type=int, default=16)
    c.add_argument("--photons", type=int, default=500_000)
    c.set_defaults(fn=caustics)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
