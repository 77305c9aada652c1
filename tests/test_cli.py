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
