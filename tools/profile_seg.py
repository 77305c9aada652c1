"""Per-stage cost breakdown of the segmented fused path on the chip.

Times steady-state frames of the Proj8 scene (file-textured teapot +
spheres + env map — the seg path's canonical workload) at several
bounce budgets, then re-times with the XLA texture segment stubbed to
constants, isolating (a) per-bounce wave cost and (b) the texture
segment's share.  Usage: python -m tools.profile_seg [W H SPP]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_args = [int(x) for x in sys.argv[1:4]]
W, H, SPP = _args + [400, 300, 4][len(_args):]

SCENE_XML = "/root/reference/RayTracingProj8/RayTracingProj8/scene.xml"


def timed(fn, reps=3):
    fn()  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jnp.isfinite(out[0]).all())   # honest fence
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import dataclasses

    from rtf_tpu.render.config import PROFILES
    from rtf_tpu.render.renderer import render_device_host
    from rtf_tpu.scene import build_scene, load_scene

    desc = load_scene(SCENE_XML)
    desc.camera.width, desc.camera.height = W, H
    scene = build_scene(desc)
    base = dataclasses.replace(
        PROFILES["proj8"], min_samples=SPP, max_samples=SPP,
        split_mode="rr")

    key = jax.random.PRNGKey(0)
    print(f"scene: prj8 {W}x{H} spp={SPP}  backend={jax.default_backend()}")

    results = {}
    for nb in (0, 2, 4):
        cfg = dataclasses.replace(base, bounces=nb)
        dt = timed(lambda: render_device_host(scene, cfg, key))
        results[nb] = dt
        print(f"bounces={nb}: {dt*1e3:8.1f} ms/frame")
    per_bounce = (results[4] - results[0]) / 4
    print(f"per-bounce-wave cost: {per_bounce*1e3:.1f} ms "
          f"({SPP} spp -> {per_bounce/SPP*1e3:.2f} ms/wave-bounce)")

    # stub the texture segment: constant kd/ks/env (same shapes, no
    # gathers) to isolate the XLA hop's cost
    import rtf_tpu.render.fused_seg as fs
    orig_tex, orig_env = fs._seg_texture, fs._seg_env

    def stub_tex(scene, mtl, u, v):
        one = jnp.ones_like(u)
        return (one, one, one), (one * 0.5, one * 0.5, one * 0.5)

    fs._seg_texture = stub_tex
    fs._seg_env = lambda scene, dx, dy, dz, l2=False: None
    try:
        for nb in (0, 4):
            # nudge a cfg field: _wave_step caches on (cfg, consts), so
            # an identical cfg would reuse the un-stubbed compilation
            cfg = dataclasses.replace(base, bounces=nb,
                                      variance_threshold=1.0000001e-3)
            dt = timed(lambda: render_device_host(scene, cfg, key))
            print(f"[tex stubbed] bounces={nb}: {dt*1e3:8.1f} ms/frame "
                  f"(gathers cost {(results[nb]-dt)*1e3:+.1f} ms)")
    finally:
        fs._seg_texture, fs._seg_env = orig_tex, orig_env


if __name__ == "__main__":
    main()
