"""Unit tests for core math, Halton, transforms, PNG codec."""
import numpy as np
import jax.numpy as jnp

from rtf_tpu.core.halton import halton, halton_np
from rtf_tpu.core.math import dot, normalize, reflect
from rtf_tpu.core.transform import Transform
from rtf_tpu.utils.png import read_png, write_png


def _halton_scalar(index, base):
    # direct transcription of scene.h:131-140
    r = 0.0
    f = 1.0 / base
    i = index
    while i > 0:
        r += f * (i % base)
        f /= base
        i //= base
    return r


def test_halton_matches_reference_loop():
    for base in (2, 3, 5):
        idx = np.arange(0, 200)
        want = np.array([_halton_scalar(i, base) for i in idx], np.float32)
        got_np = halton_np(idx, base)
        got_dev = np.asarray(halton(jnp.asarray(idx), base))
        np.testing.assert_allclose(got_np, want, atol=1e-6)
        np.testing.assert_allclose(got_dev, want, atol=1e-6)


def test_halton_first_values():
    # Halton base 2: 0, 1/2, 1/4, 3/4, 1/8, 5/8 ...
    want = [0.0, 0.5, 0.25, 0.75, 0.125, 0.625]
    got = halton_np(np.arange(6), 2)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_transform_compose_matches_sequential():
    t = Transform()
    t.scale(2.0, 3.0, 4.0)
    t.rotate([0, 0, 1], 90.0)
    t.translate([1.0, -2.0, 0.5])
    p_local = np.array([1.0, 1.0, 1.0])
    # manual: scale -> rotate -> translate
    p = np.array([2.0, 3.0, 4.0])
    p = np.array([-p[1], p[0], p[2]])   # rot z 90
    p = p + [1.0, -2.0, 0.5]
    np.testing.assert_allclose(t.transform_from(p_local), p, atol=1e-12)
    # round trip
    np.testing.assert_allclose(t.transform_to(p), p_local, atol=1e-12)


def test_transform_compose_parent_child():
    parent = Transform().scale(2.0).translate([1, 0, 0])
    child = Transform().translate([0, 1, 0])
    combo = parent.compose(child)
    p = [3.0, -1.0, 2.0]
    np.testing.assert_allclose(
        combo.transform_from(p),
        parent.transform_from(child.transform_from(p)), atol=1e-12)


def test_normal_transform_perpendicular():
    # normals transformed by inv^T stay perpendicular under non-uniform scale
    t = Transform().scale(1.0, 4.0, 1.0).rotate([1, 1, 0], 33.0)
    tangent_local = np.array([1.0, 0.0, 0.0])
    normal_local = np.array([0.0, 1.0, 0.0])   # perpendicular in local
    tw = t.m @ tangent_local
    nw = t.inv.T @ normal_local
    assert abs(np.dot(tw, nw)) < 1e-12


def test_vec_ops():
    v = jnp.array([[3.0, 0.0, 4.0]])
    n = normalize(v)
    np.testing.assert_allclose(np.asarray(dot(n, n)), [1.0], atol=1e-6)
    # reflect: view straight down onto z-plane
    view = jnp.array([[0.0, 0.0, 1.0]])
    nrm = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(reflect(view, nrm)), [[0, 0, 1.0]], atol=1e-7)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_grey_roundtrip(tmp_path):
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "g.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back[:, :, 0], img)


def test_png_decode_reference_texture():
    import os
    path = "/root/reference/RayTracingProj13/RayTracingProj13/bricks.png"
    if not os.path.exists(path):
        return
    img = read_png(path)
    assert img.ndim == 3 and img.shape[2] in (3, 4)
    assert img.shape[0] > 4 and img.shape[1] > 4
    assert img.max() > 32  # actually decoded something


def test_env_uvw_matches_reference_formula():
    """Angular map (scene.h:426-432): z*(x,y)/norm(x,y) rotated 45deg.

    Era quirk (round-2 fidelity find): Proj7's SampleEnvironment
    normalizes the xy projection with the EUCLIDEAN norm
    sqrt(x^2+y^2)+1e-10 (Proj7 scene.h:461-463); Proj8 through Final
    use the L1 norm |x|+|y| (Final scene.h:428-430).  Both are
    exposed via the l2 flag (cfg.env_l2)."""
    import math

    from rtf_tpu.ops.texture import env_uv_ch, env_uvw

    rng = np.random.default_rng(7)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for l2 in (False, True):
        got = np.asarray(env_uvw(jnp.asarray(d), l2=l2))
        gu, gv = env_uv_ch(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                           jnp.asarray(d[:, 2]), l2=l2)
        for i in range(d.shape[0]):
            x0, y0, z0 = (float(v) for v in d[i])
            z = math.asin(max(-1.0, min(1.0, -z0))) / math.pi + 0.5
            if l2:
                den = math.sqrt(x0 * x0 + y0 * y0) + 1e-10
            else:
                den = abs(x0) + abs(y0)
            x, y = x0 / den, y0 / den
            u_ref = 0.5 + z * (x * 0.5 - y * 0.5)
            v_ref = 0.5 + z * (x * 0.5 + y * 0.5)
            assert abs(got[i, 0] - u_ref) < 1e-5
            assert abs(got[i, 1] - v_ref) < 1e-5
            assert abs(float(gu[i]) - u_ref) < 1e-5
            assert abs(float(gv[i]) - v_ref) < 1e-5
