"""Ray-differential texture filtering (the analog of the reference's
Texture::Sample elliptic filter, scene.h:331-349, plus the disabled
calculateduvw footprint propagation, RayTracingProj7 objects.h:81-158).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rtf_tpu.render.config import RenderConfig
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.model import TexMapDesc, TextureDesc, TexturedColorDesc
from rtf_tpu.scene.procedural import box_scene

C1 = np.array([0.0, 0.0, 0.0], np.float32)
C2 = np.array([1.0, 1.0, 1.0], np.float32)


def _checker_scene(w=48, h=36, freq=1.0):
    """freq > 1 tiles the checker finer via the texmap transform
    (TextureMap uvw transform, scene.h:376-398) — at freq ~32 the cells
    shrink to ~1 px and the 1-spp render aliases hard."""
    from rtf_tpu.core.transform import Transform
    desc = box_scene(width=w, height=h, with_mesh=False)
    chk = TextureDesc(kind="checker", name="chk", color1=C1, color2=C2)
    xf = Transform().scale(1.0 / freq)
    for nm in sorted(desc.materials):
        m = desc.materials[nm]
        m.diffuse = TexturedColorDesc(m.diffuse.color,
                                      TexMapDesc(chk, xf))
    return build_scene(desc)


def test_filtered_sampler_tiny_footprint_equals_point_sample():
    scene = _checker_scene()
    from rtf_tpu.ops.texture import sample_texmap, sample_texmap_filtered
    tm = int(np.asarray(scene.materials.diffuse_tm).max())
    rng = np.random.RandomState(0)
    uvw = jnp.asarray(rng.uniform(0.05, 0.95, (64, 3)).astype(np.float32))
    tm_id = jnp.full((64,), tm, jnp.int32)
    tiny = jnp.full((64, 2), 1e-7, jnp.float32)
    point = sample_texmap(scene, tm_id, uvw)
    filt = sample_texmap_filtered(scene, tm_id, uvw, tiny, tiny,
                                  n_samples=8)
    np.testing.assert_allclose(np.asarray(filt), np.asarray(point),
                               atol=1e-4)


def test_filtered_sampler_wide_footprint_averages_checker():
    """A footprint spanning whole checker periods converges to the
    checker mean regardless of the base uv."""
    scene = _checker_scene()
    from rtf_tpu.ops.texture import sample_texmap_filtered
    tm = int(np.asarray(scene.materials.diffuse_tm).max())
    rng = np.random.RandomState(1)
    uvw = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    tm_id = jnp.full((64,), tm, jnp.int32)
    d0 = jnp.tile(jnp.asarray([[8.0, 0.0]], jnp.float32), (64, 1))
    d1 = jnp.tile(jnp.asarray([[0.0, 8.0]], jnp.float32), (64, 1))
    filt = np.asarray(sample_texmap_filtered(scene, tm_id, uvw, d0, d1,
                                             n_samples=32))
    mean = (C1 + C2) / 2.0
    assert np.abs(filt.mean(0) - mean).max() < 0.1
    # and every individual sample is strictly fractional (no pure texel)
    assert (filt > 0.05).all() and (filt < 0.95).all()


def test_footprint_duv_zero_on_miss_and_secondary():
    scene = _checker_scene()
    from rtf_tpu.ops.trace import footprint_duv, resolve_surface, trace
    # grazing hit, head-on ceiling hit (degenerate d x N -> fallback
    # frame must kick in), and a miss from far outside the box
    o = jnp.asarray([[0.0, -25.0, 6.0], [0.0, -25.0, 6.0],
                     [0.0, 0.0, 1.0e6]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, -0.2], [0.0, 0.0, 1.0],
                     [0.0, 0.0, 1.0]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace(scene, o, d)
    surf = resolve_surface(scene, o, d, hit)
    duv0, duv1 = footprint_duv(scene, o, d, hit, surf, 1e-3, 1e-3)
    duv0, duv1 = np.asarray(duv0), np.asarray(duv1)
    hits = np.asarray(hit.is_hit)
    assert hits[0] and hits[1] and not hits[2]
    for i in range(3):
        if not hits[i]:
            assert np.all(duv0[i] == 0) and np.all(duv1[i] == 0)
        else:
            assert np.isfinite(duv0[i]).all() and np.isfinite(duv1[i]).all()
            assert (np.abs(duv0[i]).max() > 0) or (np.abs(duv1[i]).max() > 0)


def test_render_tex_filter_smooths_minified_checker():
    """End-to-end: 1-spp render of a distant checker floor.  Filtering
    must cut the pixel-to-pixel flicker in the minified region while
    leaving the magnified foreground nearly unchanged."""
    from rtf_tpu.render.renderer import render
    scene = _checker_scene(64, 48, freq=24.0)
    base = RenderConfig(min_samples=1, max_samples=1, bounces=0,
                        shadow_min=1, shadow_max=1, gi_mode="none",
                        gamma=0.0)
    import dataclasses
    filt_cfg = dataclasses.replace(base, tex_filter=True,
                                   tex_filter_samples=16)
    img0 = np.asarray(render(scene, base).image, np.float32) / 255.0
    img1 = np.asarray(render(scene, filt_cfg).image, np.float32) / 255.0
    assert img0.shape == img1.shape
    # horizontal neighbor-difference energy as an aliasing proxy
    def tv(img):
        return np.abs(np.diff(img.mean(-1), axis=1)).mean()
    assert tv(img1) < tv(img0) * 0.9, (tv(img0), tv(img1))
    # overall brightness preserved (filter is an average, not a bias)
    assert abs(img1.mean() - img0.mean()) < 0.05
