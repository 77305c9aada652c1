"""Golden-image comparison against the reference's committed renders.

The reference repo ships the output PNG of each project next to its
scene (SURVEY.md section 4 — they are the de-facto regression baseline).
This tool renders the same scene with rtf_tpu at the same resolution and
profile and reports per-pixel RMSE (BASELINE.json asks <= 1e-3 RMSE for
deterministic configs; stochastic configs are looser because the
reference RNG differs).

Usage:  python -m tools.golden [name ...]     (default: all)
"""
from __future__ import annotations

import dataclasses
import sys

REF = "/root/reference"

# name -> (scene xml, golden png, profile name, overrides)
CASES = {
    # Proj5: deterministic Whitted (1 spp, no RNG anywhere): tight bound
    "prj5": (f"{REF}/RayTracingProj5/RayTracingProj5/scene.xml",
             f"{REF}/RayTracingProj5/RayTracingProj5/prj5input.png",
             "proj5", {}),
    # Proj5 z-buffer: FULLY deterministic (geometry + transforms only,
    # no RNG/shading) — the tightest parity check available
    "prj5z": (f"{REF}/RayTracingProj5/RayTracingProj5/scene.xml",
              f"{REF}/RayTracingProj5/RayTracingProj5/prj5_zbuff.png",
              "proj5", {"__aov__": "zbuffer"}),
    # Proj7: + textures (file + checker), still deterministic
    "prj7": (f"{REF}/RayTracingProj7/RayTracingProj7/scene.xml",
             f"{REF}/RayTracingProj7/RayTracingProj7/prj7.png",
             "proj7", {}),
    # Proj8: adaptive AA (Halton subpixels deterministic, but sample
    # escalation differs) — loose
    "prj8": (f"{REF}/RayTracingProj8/RayTracingProj8/scene.xml",
             f"{REF}/RayTracingProj8/RayTracingProj8/prj8_16sample.png",
             "proj8", {"split_mode": "rr"}),
    # Proj10: soft shadows (size-5 point light, adaptive disk samples)
    # + glossy reflections (normal perturbation) — stochastic, loose;
    # runs on the segmented kernel path (glossy kernelized round 2)
    # (prj10input.png is the pre-feature INPUT render — black spheres,
    # hard shadows; the actual golden is the jpg)
    "prj10": (f"{REF}/RayTracingProj10/RayTracingProj10/scene.xml",
              f"{REF}/RayTracingProj10/prj10.jpg",
              "proj10", {"min_samples": 16, "max_samples": 16,
                         "split_mode": "rr"}),
    # Proj9: depth of field (64 random lens samples — different RNG)
    "prj9": (f"{REF}/RayTracingProj9/RayTracingProj9/scene9.xml",
             f"{REF}/RayTracingProj9/RayTracingProj9/prj9.png",
             "proj8", {"min_samples": 16, "max_samples": 16,
                       "split_mode": "rr"}),
    # Proj13 box: Monte-Carlo GI — loose (different RNG)
    "prj13box": (f"{REF}/RayTracingProj13/RayTracingProj13/scene.xml",
                 f"{REF}/RayTracingProj13/prj13box.png",
                 "proj11", {"min_samples": 16, "max_samples": 16,
                            "split_mode": "rr"}),
    # Proj13 box rendered with the photon map as ALL diffuse lighting
    # (the look of the committed golden; its in-code GI is commented
    # out — see GOLDENS.md)
    "prj13box_pm": (f"{REF}/RayTracingProj13/RayTracingProj13/scene.xml",
                    f"{REF}/RayTracingProj13/prj13box.png",
                    "proj11",
                    {"min_samples": 8, "max_samples": 8,
                     "gi_mode": "pm_direct", "hemisphere_samples": 0,
                     "photon_count": 1_000_000, "knn_k": 400,
                     "knn_radius": 1.0}),
}


def run(name):
    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import render
    from rtf_tpu.scene import build_scene, load_scene
    from rtf_tpu.utils.image import rmse
    from rtf_tpu.utils.png import read_png, write_png

    xml, golden_png, profile, over = CASES[name]
    over = dict(over)
    aov = over.pop("__aov__", "beauty")
    if golden_png.endswith(".jpg"):
        import numpy as np
        from PIL import Image
        golden = np.asarray(Image.open(golden_png).convert("RGB"))
    else:
        golden = read_png(golden_png)
    h, w = golden.shape[:2]
    desc = load_scene(xml)
    desc.camera.width, desc.camera.height = w, h
    scene = build_scene(desc)
    cfg = PROFILES[profile]
    if over:
        cfg = dataclasses.replace(cfg, **over)
    res = render(scene, cfg)
    out = f"/tmp/golden_{name}.png"
    if aov == "zbuffer":
        from rtf_tpu.utils.image import zbuffer_image
        img = zbuffer_image(res.z)
        img = img[..., None].repeat(3, axis=-1)
    else:
        img = res.image
    write_png(out, img)
    err = rmse(img, golden[:, :, :3])
    print(f"{name}: RMSE {err:.5f} vs {golden_png}  (ours: {out})")
    return err


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for n in names:
        try:
            run(n)
        except Exception as e:  # keep going; report per case
            print(f"{n}: FAILED {type(e).__name__}: {e}")
