"""Final-era hybrid-GI fidelity case (round-2 VERDICT #2c).

The RayTracingFinal snapshot is the one era whose GI code is LIVE (the
Proj13 snapshot ships it commented out), so this is the only way to
measure our photon-volume + stratified-hemisphere pipeline against the
reference's own MtlBlinn::Shade (Final/main.cpp:642-705): 30-sample
cosine hemisphere at the first bounce, photon-map kNN estimate
(EstimateIrradiance<400>, r=1) at deeper bounces, BOUNCE=4, gamma 2.2.

Oracle: the reference's own binary (tools/oracle) on data/scene_b.xml,
MIN_SAMPLE==MAX_SAMPLE forced (no adaptive divergence), reduced
resolution (single-core C++).  Ours: the TPU fused GI path — photon
volume, host-chunked stratified hemisphere fan-out — at the identical
sampling budget.  Both sides are Monte Carlo (the reference's
hemisphere and photon sampling use rand(), main.cpp:658-661), so the
RMSE records agreement of the MEANS at matched budgets; per-pixel MC
noise alone contributes on the order of contrast/sqrt(2*spp*hemi).

Usage: python -m tools.final_gi_case [--width 200 --height 150 --spp 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=200)
    ap.add_argument("--height", type=int, default=150)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--oracle-only", action="store_true",
                    help="render/restore the oracle side and exit")
    ap.add_argument("--hemi0", action="store_true",
                    help="committed-code parity mode: render ours with "
                    "hemisphere_samples=0 (the reference's Final-era "
                    "hemisphere GI is dead code — its traced radiance "
                    "lands in a shadowing inner `Color idrColor;`, "
                    "main.cpp:673-686 — so the committed binary's "
                    "effective lighting is direct + Fresnel + deep-"
                    "bounce photon; proof: -DHEMISPHERE_SAMPLE=0 "
                    "oracle is byte-identical.  GOLDENS.md finalgi.)")
    args = ap.parse_args(argv)
    w, h, spp = args.width, args.height, args.spp

    from tools.oracle_golden import PERSIST, oracle_render
    t0 = time.time()
    oracle_png = oracle_render(
        "RayTracingFinal",
        (f"MIN_SAMPLE={spp}", f"MAX_SAMPLE={spp}"),
        "data/scene_b.xml", (w, h))
    print(f"[final_gi] oracle ready in {time.time()-t0:.0f}s: "
          f"{oracle_png}", file=sys.stderr)
    if args.oracle_only:
        return 0

    import tools.cache  # noqa: F401

    import numpy as np
    import jax
    import jax.numpy as jnp

    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import finalize, render_device_host
    from rtf_tpu.scene import build_scene, load_scene
    from rtf_tpu.utils.image import rmse
    from rtf_tpu.utils.png import read_png, write_png

    golden = read_png(oracle_png)
    # load the oracle's own copy of the scene so both sides see the
    # identical assets (incl. which meshes are missing)
    wd = os.path.dirname(oracle_png)
    xml = os.path.join(wd, "data", "scene_b.xml")
    cwd = os.getcwd()
    try:
        os.chdir(wd)
        desc = load_scene(xml)
        desc.camera.width, desc.camera.height = w, h
        scene = build_scene(desc)
    finally:
        os.chdir(cwd)
    cfg = PROFILES["final"].with_(split_mode="rr", min_samples=spp,
                                  max_samples=spp)
    if args.hemi0:
        cfg = cfg.with_(hemisphere_samples=0)
    t0 = time.time()
    # the committed CPU-baked scene_b volume (tools/flagship): same
    # seed-7 1M-photon pass + k=400 r=1 bake the renderer would derive
    # from prepare_photon_grid, precomputed off-chip and cached on disk
    from tools.flagship import sceneb_volume
    vol = sceneb_volume(scene, cfg)
    print(f"[final_gi] photon volume ready in {time.time()-t0:.0f}s",
          file=sys.stderr)
    t0 = time.time()
    out = render_device_host(scene, cfg, jax.random.PRNGKey(0),
                             gi_grid=vol)
    assert bool(np.asarray(jnp.isfinite(out[0]).all()))
    res = finalize(scene, cfg, *out)
    print(f"[final_gi] our render in {time.time()-t0:.0f}s",
          file=sys.stderr)
    os.makedirs(PERSIST, exist_ok=True)
    ours = os.path.join(
        PERSIST, "ours_finalgi_hemi0.png" if args.hemi0
        else "ours_finalgi.png")
    write_png(ours, res.image)
    err = rmse(res.image, golden[:, :, :3])
    print(f"finalgi: RMSE {err:.5f} vs converged oracle {oracle_png}"
          f"  (ours: {ours}; {w}x{h}, flat {spp} spp, "
          f"{cfg.hemisphere_samples} hemi, BOUNCE=4, photon k=400 r=1)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
