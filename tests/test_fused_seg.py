"""Segmented fused path (render/fused_seg.py): Pallas hit kernel + XLA
texture segment + Pallas shade kernel vs the XLA wavefront."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from rtf_tpu.render import integrator as I
from rtf_tpu.render.camera import (
    pixel_order, pixel_order_inv, primary_rays, primary_rays_ch,
)
from rtf_tpu.render.config import RenderConfig
from rtf_tpu.render.fused import fusable, frozen_consts, mxu_tables
from rtf_tpu.render.fused_seg import fusable_seg, fused_wave_seg
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.model import TexMapDesc, TextureDesc, TexturedColorDesc
from rtf_tpu.scene.procedural import box_scene


def _textured_desc(w=32, h=24):
    desc = box_scene(width=w, height=h, with_mesh=False)
    rng = np.random.RandomState(7)
    img = rng.rand(16, 16, 3).astype(np.float32)
    ftex = TextureDesc(kind="file", name="f", data=img)
    chk = TextureDesc(kind="checker", name="c",
                      color1=np.array([0.1, 0.1, 0.1]),
                      color2=np.array([0.9, 0.8, 0.2]))
    names = sorted(desc.materials)
    m0 = desc.materials[names[0]]
    m0.diffuse = TexturedColorDesc(m0.diffuse.color, TexMapDesc(ftex))
    m1 = desc.materials[names[1]]
    m1.diffuse = TexturedColorDesc(m1.diffuse.color, TexMapDesc(chk))
    return desc


def test_seg_gate_and_paths():
    scene = build_scene(_textured_desc())
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    assert not fusable(scene, cfg)      # file texture -> not monolithic
    assert fusable_seg(scene, cfg)


def test_seg_matches_xla_bounce0():
    scene = build_scene(_textured_desc())
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    w, h = scene.width, scene.height
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                        halton_bases=(2, 3))
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    n = w * h
    alive = jnp.ones((n,), bool)
    consts = frozen_consts(scene).obj
    rad3, hitl, zl = fused_wave_seg(cfg, consts, scene, o3, d3, alive,
                                    jnp.int32(3), bounces=0,
                                    mesh_tables=mxu_tables(scene))
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    inv_np = np.asarray(inv)
    rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
    np.testing.assert_array_equal(
        np.asarray(hitl)[inv_np], np.asarray(out.hit_count) > 0)
    np.testing.assert_allclose(rad_f, np.asarray(out.radiance), atol=5e-4)


def test_seg_bounces_mean_matches_xla():
    """Multi-bounce with reflective/refractive spheres + textures: RR RNG
    differs, means agree."""
    scene = build_scene(_textured_desc(48, 32))
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=2,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    w, h = scene.width, scene.height
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                        halton_bases=(2, 3))
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    n = w * h
    alive = jnp.ones((n,), bool)
    consts = frozen_consts(scene).obj
    rad3, _, _ = fused_wave_seg(cfg, consts, scene, o3, d3, alive,
                                jnp.int32(11),
                                mesh_tables=mxu_tables(scene))
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    mean_f = float(sum(np.asarray(c).mean() for c in rad3) / 3.0)
    mean_x = float(np.asarray(out.radiance).mean())
    assert abs(mean_f - mean_x) / max(mean_x, 1e-9) < 0.05


import pytest


@pytest.mark.parametrize("subdiv", [1, 3])
def test_seg_mesh_texture_matches_xla(subdiv):
    """Textured MESH material: per-face vertex uv interpolated in the
    hit kernels (subdiv=1: immediates rows 21-29; subdiv=3: MXU shade
    cols 13-18) must reproduce the XLA texture lookup."""
    desc = box_scene(width=32, height=24, with_mesh=True,
                     mesh_subdiv=subdiv)
    rng = np.random.RandomState(3)
    img = rng.rand(8, 8, 3).astype(np.float32)
    ftex = TextureDesc(kind="file", name="f", data=img)
    # the icosphere mesh material is the one named with 'mesh'
    target = None
    for nm, m in desc.materials.items():
        if "mesh" in nm.lower():
            target = m
    if target is None:   # fall back: any diffuse material used by mesh
        target = desc.materials[sorted(desc.materials)[0]]
    target.diffuse = TexturedColorDesc(target.diffuse.color,
                                       TexMapDesc(ftex))
    scene = build_scene(desc)
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    assert fusable_seg(scene, cfg)
    w, h = scene.width, scene.height
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                        halton_bases=(2, 3))
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    n = w * h
    alive = jnp.ones((n,), bool)
    consts = frozen_consts(scene).obj
    rad3, hitl, zl = fused_wave_seg(cfg, consts, scene, o3, d3, alive,
                                    jnp.int32(3), bounces=0,
                                    mesh_tables=mxu_tables(scene))
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    inv_np = np.asarray(inv)
    rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
    np.testing.assert_allclose(rad_f, np.asarray(out.radiance), atol=5e-4)


def test_seg_gi_hemisphere_mean_matches_xla():
    """Segmented fused GI (wave_fn plumbed through the fused GI
    drivers) tracks the XLA hemisphere-GI path in the mean, with
    textures in play."""
    from rtf_tpu.render.fused import fused_gi_wave
    scene = build_scene(_textured_desc(48, 32))
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=2,
                       shadow_min=1, shadow_max=1, gi_mode="hemisphere",
                       hemisphere_samples=6)
    assert fusable_seg(scene, cfg)
    w, h = scene.width, scene.height
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                        halton_bases=(2, 3))
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    n = w * h
    alive = jnp.ones((n,), bool)
    consts = frozen_consts(scene).obj

    def wave_fn(cfg_, consts_, o3_, d3_, alive_, seed_, **kw):
        return fused_wave_seg(cfg_, consts_, scene, o3_, d3_, alive_,
                              seed_, **kw)

    rad3, hit, z = fused_gi_wave(cfg, consts, o3, d3, alive,
                                 jnp.int32(5), jax.random.PRNGKey(2),
                                 mesh_tables=mxu_tables(scene),
                                 wave_fn=wave_fn)
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    mean_f = float(sum(np.asarray(c).mean() for c in rad3) / 3.0)
    mean_x = float(np.asarray(out.radiance).mean())
    rad0 = I.render_wave(scene, cfg.with_(gi_mode="none"), o, d,
                         order, alive, key, n, inv_pixel=inv).radiance
    assert mean_f > float(np.asarray(rad0).mean())
    assert abs(mean_f - mean_x) / max(mean_x, 1e-9) < 0.08


def test_seg_deferred_resolve_matches_xla_subprocess():
    """RTF_SEG_DEFER=1 (deferred winner resolve — t+face-id in-kernel,
    normals/mtl/uv via the XLA gather _resolve_hit) must reproduce the
    XLA wavefront like the default in-kernel resolve does.  The knob is
    read once at import (jit caches are not env-keyed), so the deferred
    variant runs in a subprocess."""
    import subprocess
    import sys
    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["RTF_SEG_DEFER"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from rtf_tpu.render import integrator as I
from rtf_tpu.render.camera import (pixel_order, pixel_order_inv,
                                   primary_rays, primary_rays_ch)
from rtf_tpu.render.config import RenderConfig
from rtf_tpu.render.fused import frozen_consts, mxu_tables
from rtf_tpu.render.fused_seg import _SEG_DEFER, fused_wave_seg, fusable_seg
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene
assert _SEG_DEFER
desc = box_scene(width=32, height=24, with_mesh=True, mesh_subdiv=3)
scene = build_scene(desc)
cfg = RenderConfig(min_samples=4, max_samples=4, bounces=0,
                   shadow_min=1, shadow_max=1, gi_mode="none",
                   split_mode="rr")
assert fusable_seg(scene, cfg)
consts = frozen_consts(scene).obj
insts = consts["mesh_insts"]
assert insts and "mxu" in insts[0], "defer test needs the MXU path"
w, h = scene.width, scene.height
order = jnp.asarray(pixel_order(w, h))
px, py = order % w, order // w
key = jax.random.PRNGKey(0)
o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                    halton_bases=(2, 3))
o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                         halton_bases=(2, 3))
n = w * h
alive = jnp.ones((n,), bool)
rad3, hitl, zl = fused_wave_seg(cfg, consts, scene, o3, d3, alive,
                                jnp.int32(3), bounces=0,
                                mesh_tables=mxu_tables(scene))
inv = jnp.asarray(pixel_order_inv(w, h))
out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                    inv_pixel=inv)
inv_np = np.asarray(inv)
rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
np.testing.assert_allclose(rad_f, np.asarray(out.radiance), atol=5e-4)
print("DEFER-OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["XLA_FLAGS"] = ("--xla_backend_optimization_level=0"
                        " --xla_llvm_disable_expensive_passes=true")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=900)
    assert proc.returncode == 0 and "DEFER-OK" in proc.stdout, \
        proc.stdout[-2000:]
