"""Benchmark: 800x600 box scene at 64 spp on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
Metric = Mrays/sec/chip counting primary + shadow rays (the BASELINE.json
headline); extras carry the frame time plus two slower secondary figures.
North star: 100 Mrays/sec/chip on v5e (vs_baseline = value / 100).

Emission contract (VERDICT round-2 #1 — round 2's run timed out inside an
extra and the headline was never printed): the JSON line is emitted by
`_emit()`, which is guarded to run exactly once and is registered (a) at
the end of main, (b) via atexit, and (c) on SIGTERM — the signal `timeout`
sends — so a driver kill mid-extra still lands the headline in the output
tail.  Each extra runs only if the remaining budget allows it and under
its own SIGALRM cap, so the worst-case wall time stays inside
BENCH_BUDGET (default 780 s from process start).
"""
import atexit
import json
import os
import signal
import sys
import time

_T0 = time.monotonic()
BUDGET = float(os.environ.get("BENCH_BUDGET", 780))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import tools.cache  # noqa: F401  (persistent XLA compile cache)

WIDTH = int(os.environ.get("BENCH_WIDTH", 800))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 600))
SPP = int(os.environ.get("BENCH_SPP", 64))
BOUNCES = int(os.environ.get("BENCH_BOUNCES", 4))

_RESULT = None       # headline dict, set the moment mrays is computed
_EMITTED = False


def _remaining() -> float:
    return BUDGET - (time.monotonic() - _T0)


def _emit():
    """Print the headline JSON exactly once (idempotent; signal-safe
    enough: a plain print + flush)."""
    global _EMITTED
    if _EMITTED or _RESULT is None:
        return
    _EMITTED = True
    print(json.dumps(_RESULT), flush=True)


def _on_term(signum, frame):
    _emit()
    os._exit(0)


class _Timeout(Exception):
    pass


def _with_alarm(seconds, fn):
    """Run fn under a SIGALRM cap; raises _Timeout when it fires."""
    def _raise(signum, frame):
        raise _Timeout()
    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(max(1, int(seconds)))
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    global _RESULT
    from rtf_tpu.render.config import RenderConfig
    from rtf_tpu.render.renderer import render_device_host
    from rtf_tpu.scene.build import build_scene
    from rtf_tpu.scene.procedural import box_scene

    scene = build_scene(box_scene(width=WIDTH, height=HEIGHT, with_mesh=True))
    cfg = RenderConfig(min_samples=SPP, max_samples=SPP, bounces=BOUNCES,
                       shadow_min=1, shadow_max=1, gi_mode="none",
                       queue_factor=1.0)

    import numpy as np

    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    # warmup / compile; fetch to host — on the experimental axon platform
    # block_until_ready can return before execution completes, so a
    # device->host transfer is the only honest fence.  The finiteness
    # check runs ON DEVICE so the fence transfer stays tiny (the tunnel
    # moves ~35 MB/s; pulling the full framebuffer is not rendering).
    # One retry: the tunneled worker occasionally restarts mid-session.
    for attempt in range(2):
        try:
            out = render_device_host(scene, cfg, key)
            np.asarray(jnp.isfinite(out[0]).all())
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(60)

    # best of 3: the tunneled backend's run-to-run variance is ~10%
    dt = float("inf")
    finite = True
    for rep in range(3):
        t0 = time.perf_counter()
        out = render_device_host(scene, cfg, jax.random.PRNGKey(1 + rep))
        finite = bool(np.asarray(jnp.isfinite(out[0]).all())) and finite
        dt = min(dt, time.perf_counter() - t0)
    assert finite

    # primary + shadow rays actually traced: 1 primary + 1 hard-shadow ray
    # per sample (bounce-queue rays are extra, uncounted — conservative)
    rays = 2.0 * WIDTH * HEIGHT * SPP
    mrays = rays / dt / 1e6
    print(f"[bench] headline done at t={time.monotonic() - _T0:.0f}s",
          file=sys.stderr, flush=True)

    # Regression tripwire (VERDICT r3 #6: a 31% drop shipped unnoticed
    # because nothing compared against the prior round's driver record):
    # the latest BENCH_r*.json is the ground truth of the last round.
    try:
        import glob
        priors = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        if priors:
            with open(priors[-1]) as f:
                prior = json.load(f).get("parsed", {}).get("value")
            if prior and mrays < 0.9 * float(prior):
                print(f"[bench] WARNING: headline {mrays:.1f} Mrays/s is "
                      f"{(1 - mrays / float(prior)) * 100:.0f}% below the "
                      f"prior round's {prior} ({os.path.basename(priors[-1])})"
                      " — investigate before shipping", file=sys.stderr,
                      flush=True)
    except Exception:
        pass

    extras = {
        "frame_time_s": round(dt, 3),
        "resolution": f"{WIDTH}x{HEIGHT}",
        "spp": SPP,
        "bounces": BOUNCES,
        "gi_frame_time_s_400x300_8spp_4hemi": None,
        "sceneb_hybrid_gi_frame_time_s_800x600": None,
        "device": str(jax.devices()[0]),
    }
    # The headline is now safe: any exit path (normal end, atexit,
    # SIGTERM from a driver timeout) prints it.  extras is the live dict
    # inside _RESULT, so figures landed before a kill are included.
    _RESULT = {
        "metric": "Mrays/sec/chip (primary+shadow)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "extras": extras,
    }
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    atexit.register(_emit)

    # secondary figures, each gated on the remaining budget and capped
    # with SIGALRM so a slow compile / wedged tunnel can only null the
    # extra, never starve the headline
    try:
        gi_cap = min(float(os.environ.get("BENCH_GI_CAP", 240)),
                     _remaining() - 90)
        if os.environ.get("BENCH_GI", "1") == "1" and gi_cap > 30:
            def run_gi():
                gi_scene = build_scene(box_scene(width=400, height=300,
                                                 with_mesh=True))
                gi_cfg = RenderConfig(
                    min_samples=8, max_samples=8, bounces=2,
                    shadow_min=1, shadow_max=1,
                    gi_mode="hemisphere", hemisphere_samples=4,
                    queue_factor=1.0)
                out = render_device_host(gi_scene, gi_cfg,
                                         jax.random.PRNGKey(0))
                np.asarray(jnp.isfinite(out[0]).all())
                t0 = time.perf_counter()
                out = render_device_host(gi_scene, gi_cfg,
                                         jax.random.PRNGKey(1))
                assert bool(np.asarray(jnp.isfinite(out[0]).all()))
                return round(time.perf_counter() - t0, 3)
            extras["gi_frame_time_s_400x300_8spp_4hemi"] = \
                _with_alarm(gi_cap, run_gi)
    except Exception:
        pass
    print(f"[bench] gi extra done at t={time.monotonic() - _T0:.0f}s",
          file=sys.stderr, flush=True)

    # flagship: scene_b 800x600 hybrid-GI steady frame (photon volume +
    # hemisphere fan-out), the reference Final configuration
    try:
        sb_cap = min(float(os.environ.get("BENCH_SCENEB_CAP", 600)),
                     _remaining() - 45)
        if os.environ.get("BENCH_SCENEB", "1") == "1" and sb_cap > 60:
            def run_sceneb():
                from tools.flagship import sceneb_frame_time
                return sceneb_frame_time()
            extras["sceneb_hybrid_gi_frame_time_s_800x600"] = \
                _with_alarm(sb_cap, run_sceneb)
    except Exception:
        pass
    print(f"[bench] sceneb extra done at t={time.monotonic() - _T0:.0f}s",
          file=sys.stderr, flush=True)

    _emit()


if __name__ == "__main__":
    main()
