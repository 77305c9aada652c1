"""CLI smoke tests (render/watch/probe/viz subcommands)."""
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

SCENE = f"{REFERENCE}/RayTracingProj3/RayTracingProj3/input2.xml"

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference scenes not present")


def test_cli_render(tmp_path):
    from rtf_tpu.cli import main
    out = tmp_path / "r.png"
    zb = tmp_path / "z.png"
    rc = main(["render", SCENE, "--profile", "proj3", "--width", "64",
               "--height", "48", "--out", str(out), "--zbuffer", str(zb)])
    assert rc == 0
    assert out.exists() and zb.exists()


def test_cli_watch_and_probe(tmp_path, capsys):
    from rtf_tpu.cli import main
    out = tmp_path / "w.png"
    rc = main(["watch", SCENE, "--profile", "proj3", "--spp", "2",
               "--width", "64", "--height", "48", "--out", str(out)])
    assert rc == 0 and out.exists()
    rc = main(["probe", SCENE, "--pixel", "32,24", "--width", "64",
               "--height", "48"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "color (linear)" in text and "z:" in text


def test_cli_photons_viz(tmp_path):
    from rtf_tpu.cli import main
    dat = tmp_path / "pm.dat"
    png = tmp_path / "pm.png"
    rc = main(["photons", SCENE, "--count", "2048", "--out", str(dat)])
    assert rc == 0 and dat.exists()
    rc = main(["viz", str(dat), "--out", str(png), "--width", "128",
               "--height", "96"])
    assert rc == 0 and png.exists()


def test_cli_watch_resume(tmp_path):
    """watch --resume checkpoints accumulators and continues."""
    from rtf_tpu.cli import main
    out = tmp_path / "r.png"
    rc = main(["watch", SCENE, "--profile", "proj3", "--spp", "2",
               "--width", "48", "--height", "36", "--out", str(out),
               "--resume"])
    assert rc == 0
    state = tmp_path / "r.png.state.npz"
    assert state.exists()
    st = np.load(state)
    assert int(st["done"]) == 2
    rc = main(["watch", SCENE, "--profile", "proj3", "--spp", "4",
               "--width", "48", "--height", "36", "--out", str(out),
               "--resume"])
    assert rc == 0
    st = np.load(state)
    assert int(st["done"]) == 4


def test_cli_preview(tmp_path):
    """Flat-shaded scene preview (GL pre-render view analog)."""
    from rtf_tpu.cli import main
    out = tmp_path / "p.png"
    rc = main(["preview", SCENE, "--width", "64", "--height", "48",
               "--out", str(out)])
    assert rc == 0 and out.exists()
    from rtf_tpu.utils.png import read_png
    img = read_png(str(out))
    assert img.shape[:2] == (48, 64)
    # scene content present: not a constant image
    assert img.std() > 0.01


def test_progress_callback_counts_waves():
    """render_device_host fires progress_cb after every dispatch batch
    and the final count equals the waves actually dispatched."""
    import jax
    from rtf_tpu.render.config import RenderConfig
    from rtf_tpu.render.renderer import render_device_host
    from rtf_tpu.scene import build_scene, load_scene

    desc = load_scene(SCENE)
    desc.camera.width, desc.camera.height = 32, 24
    scene = build_scene(desc)
    cfg = RenderConfig(min_samples=2, max_samples=2, bounces=1,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    calls = []
    render_device_host(scene, cfg, jax.random.PRNGKey(0),
                       progress_cb=lambda d, t: calls.append((d, t)))
    assert calls, "progress_cb never fired"
    done, total = calls[-1]
    assert done == total == 2
    assert [c[0] for c in calls] == sorted(c[0] for c in calls)


def test_cli_view_midrender(tmp_path):
    """`view` renders any view mode from the checkpoint that watch
    rewrites after every pass — mid-render view switching (the
    viewport's 1-5 keys, viewport.cpp:414-480) without touching the
    in-flight render."""
    from rtf_tpu.cli import main
    out = tmp_path / "r.png"
    rc = main(["watch", SCENE, "--profile", "proj3", "--spp", "2",
               "--width", "48", "--height", "36", "--out", str(out),
               "--resume"])
    assert rc == 0
    state = str(tmp_path / "r.png.state.npz")
    for mode in ("image", "z", "samplecount"):
        view = tmp_path / f"v_{mode}.png"
        rc = main(["view", SCENE, state, "--mode", mode,
                   "--profile", "proj3", "--out", str(view)])
        assert rc == 0 and view.exists()
    from rtf_tpu.utils.png import read_png
    # the image view from the checkpoint equals the watch output
    np.testing.assert_array_equal(read_png(str(tmp_path / "v_image.png")),
                                  read_png(str(out)))


def test_preview_dof_accumulation():
    """DOF preview: lens-jittered frame accumulation (the GL 32-frame
    DOF preview, viewport.cpp:76-80,344-361) blurs out-of-focus
    geometry relative to the pinhole preview, deterministically."""
    from rtf_tpu.render.renderer import preview
    from rtf_tpu.scene import build_scene, load_scene

    desc = load_scene(SCENE)
    desc.camera.width, desc.camera.height = 64, 48
    desc.camera.dof = 0.4
    scene = build_scene(desc)
    pin = preview(scene, dof_frames=1)
    blur = preview(scene, dof_frames=8)
    blur2 = preview(scene, dof_frames=8)
    np.testing.assert_array_equal(blur.image, blur2.image)
    assert np.abs(pin.image.astype(int) - blur.image.astype(int)).mean() > 0.5
