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
    # mesh_subdiv=1 (80 faces): interpret mode executes the kernel
    # eagerly op-by-op, so suite time scales with the triangle unroll
    scene = build_scene(box_scene(width=w, height=h, with_mesh=with_mesh,
                                  mesh_subdiv=1))
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
    assert fusable(scene, cfg.with_(gi_mode="hemisphere"))
    assert fusable(scene, cfg.with_(gi_mode="photon"))
    assert not fusable(scene, cfg.with_(gi_mode="photon",
                                        photon_volume=False))
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


def test_fused_wave_glossy_mean():
    """Proj10 glossy reflection/refraction now runs IN the kernel
    (perturbed-normal children, main.cpp:633-659): the fused path must
    accept glossy scenes and agree with the XLA path in the mean."""
    from rtf_tpu.scene.procedural import box_scene as _bs

    desc = _bs(width=48, height=32, with_mesh=False)
    desc.materials["mirror"].reflection_glossiness = 0.15
    desc.materials["glass"].refraction_glossiness = 0.15
    scene = build_scene(desc)
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=2,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    assert fusable(scene, cfg)       # the glossy gate is gone
    w, h = scene.width, scene.height
    n = w * h
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o, d = primary_rays(scene, px, py, jnp.zeros_like(px), key=key,
                        halton_bases=(2, 3))
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    rad3, _, _ = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(5))
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    mean_f = float(sum(np.asarray(c).mean() for c in rad3) / 3.0)
    mean_x = float(np.asarray(out.radiance).mean())
    assert np.isfinite(mean_f)
    assert abs(mean_f - mean_x) / max(mean_x, 1e-9) < 0.06


def test_fused_gi_hemisphere_mean_matches_xla():
    """Fused hemisphere GI (surface-output relaunch scheme) must agree
    in the mean with the XLA GI path (different RNG streams)."""
    from rtf_tpu.render.fused import fused_gi_wave
    scene, cfg, order, o, d, o3, d3, key = _setup(w=48, h=32)
    cfg = cfg.with_(bounces=2, gi_mode="hemisphere", hemisphere_samples=8)
    n = scene.width * scene.height
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    rad3, hit, z = fused_gi_wave(cfg, consts, o3, d3, alive,
                                 jnp.int32(5), jax.random.PRNGKey(2))
    inv = jnp.asarray(pixel_order_inv(scene.width, scene.height))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    mean_f = float(sum(np.asarray(c).mean() for c in rad3) / 3.0)
    mean_x = float(np.asarray(out.radiance).mean())
    # GI must actually add energy over the no-GI render
    rad0 = I.render_wave(scene, cfg.with_(gi_mode="none"), o, d,
                         order, alive, key, n, inv_pixel=inv).radiance
    assert mean_f > float(np.asarray(rad0).mean())
    assert abs(mean_f - mean_x) / max(mean_x, 1e-9) < 0.08


def test_fused_gi_photon_volume_mean():
    """Fused hybrid GI (hemisphere first bounce + volume photon
    estimates deeper) tracks the XLA photon path in the mean."""
    from rtf_tpu.gi.grid import build_photon_grid
    from rtf_tpu.gi.photon import shoot_photons
    from rtf_tpu.gi.volume import build_irradiance_volume
    from rtf_tpu.render.fused import fused_gi_wave
    scene, cfg, order, o, d, o3, d3, key = _setup(w=24, h=16)
    cfg = cfg.with_(bounces=1, gi_mode="photon", hemisphere_samples=2,
                    knn_radius=3.0, knn_k=64)
    pm = shoot_photons(scene, cfg, n_emit=4096, capacity=8192,
                       key=jax.random.PRNGKey(1))
    grid = build_photon_grid(pm, cfg.knn_radius,
                             scene.world_min, scene.world_max)
    vol = build_irradiance_volume(grid, cfg.knn_radius, cfg.knn_k,
                                  scene.world_min, scene.world_max)
    n = scene.width * scene.height
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    rad3, hit, z = fused_gi_wave(cfg, consts, o3, d3, alive,
                                 jnp.int32(9), jax.random.PRNGKey(3),
                                 gi_vol=vol)
    inv = jnp.asarray(pixel_order_inv(scene.width, scene.height))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        gi_grid=grid, inv_pixel=inv)
    mean_f = float(sum(np.asarray(c).mean() for c in rad3) / 3.0)
    mean_x = float(np.asarray(out.radiance).mean())
    assert mean_f > 0 and mean_x > 0
    # volume drops the per-photon normal test -> slightly brighter;
    # allow a wider band than the pure-hemisphere comparison
    assert 0.75 < mean_f / mean_x < 1.35


def test_fused_mxu_large_mesh_matches_xla():
    """Large-mesh (MXU Plücker table) fused path vs XLA at bounces=0 —
    exact same hits and near-identical radiance."""
    from rtf_tpu.render.fused import mxu_tables, scene_mesh_mode
    scene = build_scene(box_scene(width=32, height=24, with_mesh=True,
                                  mesh_subdiv=3))
    assert scene_mesh_mode(scene) == "mxu"
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
    consts = scene_consts(scene)
    tables = mxu_tables(scene)
    rad3, hitl, zl = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(1),
                                bounces=0, mesh_tables=tables)
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    inv_np = np.asarray(inv)
    rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
    np.testing.assert_array_equal(
        np.asarray(hitl)[inv_np], np.asarray(out.hit_count) > 0)
    np.testing.assert_allclose(rad_f, np.asarray(out.radiance), atol=3e-4)


def test_fused_mxu_streamed_tables_match_resident(monkeypatch):
    """HBM-streamed MXU tables (the >32k-face path: tiles DMA'd into
    VMEM scratch on demand) must produce bit-identical results to the
    VMEM-resident path.  The stream threshold is lowered so a small
    mesh exercises the streaming kernels."""
    from rtf_tpu.render import fused as F
    scene = build_scene(box_scene(width=32, height=24, with_mesh=True,
                                  mesh_subdiv=3))
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=1,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    w, h = scene.width, scene.height
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    n = w * h
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    tables = F.mxu_tables(scene)
    assert not F._stream_tables(tables)
    res = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(1),
                     mesh_tables=tables)
    monkeypatch.setattr(F, "MXU_VMEM_TABLE_BYTES", 0)
    assert F._stream_tables(tables)
    srm = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(1),
                     mesh_tables=tables)
    for a, b in zip(res[0], srm[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(res[1]), np.asarray(srm[1]))
    np.testing.assert_array_equal(np.asarray(res[2]), np.asarray(srm[2]))


def test_fused_soft_shadow_adaptive():
    """Adaptive in-kernel soft shadows (shadow_min -> shadow_max
    escalation, lights.h:92-129) track the fixed-count version."""
    scene = build_scene(box_scene(width=32, height=24, with_mesh=False,
                                  light_size=2.0))
    w, h = scene.width, scene.height
    order = jnp.asarray(pixel_order(w, h))
    px, py = order % w, order // w
    key = jax.random.PRNGKey(0)
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key,
                             halton_bases=(2, 3))
    n = w * h
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)

    def run(cfg):
        rad3, hitl, zl = fused_wave(cfg, consts, o3, d3, alive,
                                    jnp.int32(5), bounces=0)
        return np.stack([np.asarray(c) for c in rad3], 1), np.asarray(hitl)

    base = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                        gi_mode="none")
    fixed, hit_f = run(base.with_(shadow_min=4, shadow_max=4))
    adapt, hit_a = run(base.with_(shadow_min=2, shadow_max=4))
    np.testing.assert_array_equal(hit_f, hit_a)
    assert np.isfinite(adapt).all()
    # identical away from penumbra, close in the mean overall
    assert abs(adapt.mean() / fixed.mean() - 1.0) < 0.05
    # soft shadows produce fractional visibility somewhere
    lum = adapt.mean(-1)
    frac = ((lum > 0.02) & (lum < 0.98 * lum.max())).mean()
    assert frac > 0.1


def test_fused_checker_texture_matches_xla():
    """In-kernel checker sampling (sphere + plane uv) vs the XLA
    texture path at bounces=0 — identical pattern, tight tolerance."""
    import numpy as _np
    from rtf_tpu.scene.model import (
        TexMapDesc, TextureDesc, TexturedColorDesc,
    )
    from rtf_tpu.scene.procedural import box_scene
    desc = box_scene(width=32, height=24, with_mesh=False)
    chk = TextureDesc(kind="checker", name="chk",
                      color1=_np.array([0.1, 0.1, 0.1]),
                      color2=_np.array([0.9, 0.8, 0.2]))
    # attach to the floor material and a sphere material
    names = sorted(desc.materials)
    for nm in names[:2]:
        m = desc.materials[nm]
        m.diffuse = TexturedColorDesc(m.diffuse.color,
                                      TexMapDesc(chk))
    scene = build_scene(desc)
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    from rtf_tpu.render.fused import scene_consts as _sc
    assert fusable(scene, cfg)
    consts = _sc(scene)
    assert any("kd_chk" in m for m in consts["materials"])

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
    rad3, hitl, zl = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(1),
                                bounces=0)
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    inv_np = np.asarray(inv)
    rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
    np.testing.assert_allclose(rad_f, np.asarray(out.radiance), atol=5e-4)


def test_fused_caustic_volume_term():
    """Caustic irradiance volume adds light at camera-visible hits on
    the fused path (volume analog of the opt-in XLA caustic gather)."""
    from rtf_tpu.gi.grid import build_photon_grid
    from rtf_tpu.gi.photon import shoot_photons
    from rtf_tpu.gi.volume import build_irradiance_volume
    from rtf_tpu.render.fused import fused_gi_primary
    scene, cfg, order, o, d, o3, d3, key = _setup(w=32, h=24,
                                                  with_mesh=False)
    cfg = cfg.with_(bounces=1, caustic_radius=2.0, knn_k=64)
    pm = shoot_photons(scene, cfg, n_emit=8192, capacity=8192,
                       key=jax.random.PRNGKey(1), caustic_only=True)
    grid = build_photon_grid(pm, cfg.caustic_radius,
                             scene.world_min, scene.world_max)
    cvol = build_irradiance_volume(grid, cfg.caustic_radius, cfg.knn_k,
                                   scene.world_min, scene.world_max)
    n = scene.width * scene.height
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    base, hit, z, _ = fused_gi_primary(cfg, consts, o3, d3, alive,
                                       jnp.int32(2))
    with_c, _, _, _ = fused_gi_primary(cfg, consts, o3, d3, alive,
                                       jnp.int32(2), caustic_vol=cvol)
    mb = float(sum(np.asarray(c).mean() for c in base))
    mc = float(sum(np.asarray(c).mean() for c in with_c))
    assert np.isfinite(mc)
    assert mc > mb     # caustic photons add energy


def test_fused_checker_on_mesh_matches_xla():
    """Checker on a MESH material: the kernels interpolate per-face
    vertex uv (immediates rows 21-29 / MXU shade cols 13-18), so the
    round-1 'textured mesh material' mono gate was stale — removed in
    round 2.  Parity vs the XLA texture path at bounces=0."""
    import numpy as _np
    from rtf_tpu.scene.model import (
        TexMapDesc, TextureDesc, TexturedColorDesc,
    )
    from rtf_tpu.scene.procedural import box_scene
    desc = box_scene(width=32, height=24, with_mesh=True, mesh_subdiv=1)
    mesh = desc.root.children[-1].mesh
    # spherical per-vertex texcoords (the icosphere has none)
    v = mesh.v
    u = 0.5 + _np.arctan2(v[:, 1], v[:, 0]) / (2 * _np.pi)
    vv = 0.5 + _np.arcsin(_np.clip(v[:, 2], -1, 1)) / _np.pi
    mesh.vt = _np.stack([u, vv, _np.zeros_like(u)], 1).astype(_np.float32)
    mesh.ft = mesh.f.copy()
    chk = TextureDesc(kind="checker", name="chk",
                      color1=_np.array([0.15, 0.1, 0.1]),
                      color2=_np.array([0.9, 0.3, 0.2]))
    m = desc.materials["redball"]
    m.diffuse = TexturedColorDesc(m.diffuse.color, TexMapDesc(chk))
    scene = build_scene(desc)
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=0,
                       shadow_min=1, shadow_max=1, gi_mode="none")
    assert fusable(scene, cfg), "mesh checker must fuse (gate removed)"
    consts = scene_consts(scene)

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
    rad3, hitl, zl = fused_wave(cfg, consts, o3, d3, alive, jnp.int32(1),
                                bounces=0)
    inv = jnp.asarray(pixel_order_inv(w, h))
    out = I.render_wave(scene, cfg, o, d, order, alive, key, n,
                        inv_pixel=inv)
    inv_np = np.asarray(inv)
    rad_f = np.stack([np.asarray(rad3[c])[inv_np] for c in range(3)], 1)
    np.testing.assert_allclose(rad_f, np.asarray(out.radiance), atol=5e-4)
    # the checker must actually modulate the ball: against a plain-kd
    # render of the same scene, a real fraction of pixels must change
    # (std-over-all-hits would pass on wall gradients alone)
    plain = box_scene(width=32, height=24, with_mesh=True, mesh_subdiv=1)
    plain.root.children[-1].mesh.vt = desc.root.children[-1].mesh.vt
    plain.root.children[-1].mesh.ft = desc.root.children[-1].mesh.ft
    scene_p = build_scene(plain)
    rad3p, _, _ = fused_wave(cfg, scene_consts(scene_p), o3, d3, alive,
                             jnp.int32(1), bounces=0)
    rad_p = np.stack([np.asarray(rad3p[c])[inv_np] for c in range(3)], 1)
    changed = np.abs(rad_f - rad_p).max(-1) > 0.02
    assert changed.sum() >= 2, "checker left the mesh unmodulated"
    # BOTH checker colors must appear: r/g is shading-invariant and
    # differs per cell (0.15/0.1=1.5 vs 0.9/0.3=3.0), so a constant-uv
    # regression (single cell everywhere) collapses the spread
    ratios = ((rad_f[changed, 0] + 1e-6)
              / (rad_f[changed, 1] + 1e-6))
    assert ratios.max() / ratios.min() > 1.3, \
        "only one checker cell color visible on the mesh"


def test_gi_mesh_sort_is_pure_permutation():
    """gi_mesh_sort groups child rays by mesh-root-AABB interest before
    the child wave — a pure lane permutation, so on a deterministic
    child wave (diffuse-only materials, size-0 light: no RR split, no
    soft-shadow RNG) the unpermuted result must be BIT-IDENTICAL to the
    unsorted run.  (On RNG-consuming configs only the per-lane draws
    relabel; the estimator is unchanged.)"""
    from rtf_tpu.render.fused import fused_gi_chunks, mxu_tables, scene_consts

    desc = box_scene(width=32, height=24, with_mesh=True, mesh_subdiv=1)
    # drop the specular spheres: the child wave must consume no RNG
    desc.root.children = [c for c in desc.root.children
                          if c.name not in ("mirror", "glass")]
    del desc.materials["mirror"], desc.materials["glass"]
    scene = build_scene(desc)
    cfg = RenderConfig(min_samples=8, max_samples=8, bounces=2,
                       shadow_min=1, shadow_max=1, gi_mode="hemisphere",
                       hemisphere_samples=2, split_mode="rr")
    n = scene.width * scene.height
    order = jnp.asarray(pixel_order(scene.width, scene.height))
    px, py = order % scene.width, order // scene.width
    key = jax.random.PRNGKey(0)
    o3, d3 = primary_rays_ch(scene, px, py, jnp.zeros_like(px), key=key)
    alive = jnp.ones((n,), bool)
    consts = scene_consts(scene)
    tables = mxu_tables(scene)

    from rtf_tpu.render.fused import fused_gi_primary
    _, hit0, _, surf = fused_gi_primary(cfg, consts, o3, d3, alive,
                                        jnp.int32(5),
                                        mesh_tables=tables)
    kgi = jax.random.PRNGKey(11)
    args = (consts, surf, hit0, alive, jnp.int32(5), kgi,
            jnp.int32(0), 2)
    sorted_ = fused_gi_chunks(cfg, *args, mesh_tables=tables)
    plain = fused_gi_chunks(cfg.with_(gi_mesh_sort=False), *args,
                            mesh_tables=tables)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(sorted_[c]),
                                      np.asarray(plain[c]))
    assert float(sum(np.asarray(s).sum() for s in sorted_)) > 0
