"""Fused wave kernel (render/fused.py) vs the XLA wavefront path.

The fused path bakes the scene into kernel immediates and runs a whole
bounce per kernel launch; at bounces=0 (no Russian roulette) its output
must match integrator.render_wave bit-for-bit up to fp rounding.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rtf_tpu.render import integrator as I
from rtf_tpu.render.camera import (
    pixel_order, pixel_order_inv, primary_rays, primary_rays_ch,
)
from rtf_tpu.render.config import RenderConfig
from rtf_tpu.render.fused import fusable, fused_wave, scene_consts
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene


def _setup(w=32, h=24, with_mesh=True):
    scene = build_scene(box_scene(width=w, height=h, with_mesh=with_mesh))
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                        halton_bases=(2, 3))
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    return scene, cfg, order, o, d, o3, d3, key


def test_fusable_gate():
    scene, cfg, *_ = _setup()
    assert fusable(scene, cfg)
    assert not fusable(scene, cfg.with_(gi_mode="hemisphere"))
    assert not fusable(scene, cfg.with_(min_samples=1, split_mode="auto"))


def test_primary_rays_ch_matches():
    scene, cfg, order, o, d, o3, d3, key = _setup()
    for c in range(3):
        np.testing.assert_allclose(np.asarray(o3[c]), np.asarray(o[:, c]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(d3[c]), np.asarray(d[:, c]),
                                   atol=1e-6)


def test_fused_wave_matches_xla_bounce0():
    scene, cfg, order, o, d, o3, d3, key = _setup()
    w, h = scene.width, scene.height
    n = w * h
    inv = jnp.asarray(pixel_order_inv(w, h))
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    rad3, hitl, zl = fused_wave(cfg, consts, o3, d3, alive,
                                jnp.int32(123), bounces=0)
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    inv_np = np.asarray(inv)
    rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
    rad_x = np.asarray(out.radiance)
    np.testing.assert_array_equal(
        np.asarray(hitl)[inv_np], np.asarray(out.hit_count) > 0)
    np.testing.assert_allclose(rad_f, rad_x, atol=2e-4)
    # z of hits
    m = np.asarray(out.hit_count) > 0
    np.testing.assert_allclose(np.asarray(zl)[inv_np][m],
                               np.asarray(out.z_min)[m], rtol=1e-4)


def test_fused_wave_bounces_mean():
    """Multi-bounce RR uses different RNG than the XLA path; means must
    still agree (unbiasedness)."""
    scene, cfg, order, o, d, o3, d3, key = _setup(w=48, h=32)
    cfg = cfg.with_(bounces=2)
    n = scene.width * scene.height
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    rad3, _, _ = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(5))
    inv = jnp.asarray(pixel_order_inv(scene.width, scene.height))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    mean_f = float(sum(np.asarray(c).mean() for c in rad3) / 3.0)
    mean_x = float(np.asarray(out.radiance).mean())
    assert abs(mean_f - mean_x) / max(mean_x, 1e-9) < 0.05
