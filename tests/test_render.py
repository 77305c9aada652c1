"""End-to-end render tests on tiny procedural scenes (CPU backend)."""
import numpy as np
import jax
import pytest

from rtf_tpu.render.config import RenderConfig
from rtf_tpu.render.renderer import render
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene

FAST = RenderConfig(min_samples=1, max_samples=1, bounces=2,
                    shadow_min=1, shadow_max=1, gi_mode="none")


@pytest.fixture(scope="module")
def small_scene():
    return build_scene(box_scene(64, 48, with_mesh=True))


def test_render_box_smoke(small_scene):
    res = render(small_scene, FAST)
    img = res.image
    assert img.shape == (48, 64, 3)
    assert img.mean() > 10            # not black
    assert img.mean() < 245           # not blown out
    # all primary rays hit the closed box
    assert (res.z < 1e29).all()
    # left wall reddish, right wall bluish
    left = res.radiance[24, 2]
    right = res.radiance[24, 61]
    assert left[0] > left[2]
    assert right[2] > right[0]


def test_render_deterministic(small_scene):
    a = render(small_scene, FAST, seed=3)
    b = render(small_scene, FAST, seed=3)
    np.testing.assert_array_equal(a.image, b.image)


def test_render_mirror_reflects(small_scene):
    """The mirror sphere at (8,-6,4) should show reflected wall colors, not
    black — verifies the secondary queue path."""
    res = render(small_scene, FAST)
    # without bounces, the mirror is black (kd=0)
    res0 = render(small_scene, FAST.with_(bounces=0))
    h, w = 48, 64
    # mirror sphere is right-of-center, slightly below mid
    region = res.radiance[26:40, 40:56].mean()
    region0 = res0.radiance[26:40, 40:56].mean()
    assert region > region0 + 0.01


def test_adaptive_sampling_counts(small_scene):
    cfg = FAST.with_(min_samples=2, max_samples=4,
                     variance_threshold=1e-4)
    res = render(small_scene, cfg)
    sc = res.sample_count
    assert sc.min() == 2
    assert sc.max() == 4              # some pixels escalated
    # edges of spheres should escalate; flat wall interior should not
    assert (sc == 2).mean() > 0.3


def test_gamma_applied(small_scene):
    res_g = render(small_scene, FAST.with_(gamma=2.2))
    res_l = render(small_scene, FAST.with_(gamma=0.0))
    # same radiance, different 8-bit encode
    np.testing.assert_allclose(res_g.radiance, res_l.radiance, atol=1e-6)
    mid = res_l.radiance[24, 32].mean()
    if 0.05 < mid < 0.9:
        assert res_g.image[24, 32].mean() > res_l.image[24, 32].mean()


def test_multichip_dryrun_matches_singlechip():
    """shard_map render over the 8-device virtual CPU mesh == single-device
    render: the sharded path IS renderer.adaptive_ladder/wave_contrib,
    including the adaptive variance rungs (round-2 VERDICT #4 — the old
    sharded loop was flat min_samples only)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rtf_tpu.parallel.mesh import make_mesh, render_sharded
    from rtf_tpu.render.renderer import render_device_host
    scene = build_scene(box_scene(64, 48, with_mesh=False))
    cfg = FAST.with_(min_samples=2, max_samples=4,
                     variance_threshold=1e-4)   # adaptive escalation ON
    mesh = make_mesh(n_tile=4, n_spp=2)
    rad, hits, z, ns = render_sharded(scene, cfg, mesh, seed=0)
    rad = np.asarray(rad)
    assert rad.shape == (3, 64 * 48)
    assert np.isfinite(rad).all()
    assert (np.asarray(hits) >= 1).all()   # closed box: everything hits
    ns = np.asarray(ns)
    assert ns.min() == 2 and ns.max() == 4  # escalation happened

    erad, ehits, ez, ens = render_device_host(
        scene, cfg, jax.random.PRNGKey(0))
    # FAST is RNG-free (hard shadows, both-split): identical waves; only
    # the accumulation order differs (strided + psum vs sequential)
    np.testing.assert_array_equal(np.asarray(ens), ns)
    np.testing.assert_array_equal(np.asarray(ehits), np.asarray(hits))
    # not bit-exact: accumulation order differs (strided + psum vs
    # sequential) and XLA reassociates differently at shard shapes
    np.testing.assert_allclose(np.asarray(erad), rad, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ez), np.asarray(z), atol=1e-5)


def test_multichip_fused_matches_xla_sharded():
    """The fused (Pallas) sharded path agrees with the XLA sharded path
    on a deterministic config (bounces=0, hard shadows)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rtf_tpu.parallel.mesh import make_mesh, render_sharded
    # mesh-free scene: in interpret mode the Pallas kernel executes
    # eagerly op-by-op, so the unrolled-triangle kernel under an 8-way
    # shard_map costs minutes; the mesh path is covered by test_fused
    scene = build_scene(box_scene(32, 24, with_mesh=False))
    cfg = FAST.with_(min_samples=2, max_samples=2, bounces=0,
                     shadow_min=1, shadow_max=1, gi_mode="none",
                     split_mode="rr")
    mesh = make_mesh(n_tile=2, n_spp=2, devices=jax.devices()[:4])
    rad_f, hits_f, z_f, ns_f = render_sharded(scene, cfg, mesh, seed=0,
                                              fused=True)
    rad_x, hits_x, z_x, ns_x = render_sharded(scene, cfg, mesh, seed=0,
                                              fused=False)
    np.testing.assert_array_equal(np.asarray(hits_f), np.asarray(hits_x))
    np.testing.assert_array_equal(np.asarray(ns_f), np.asarray(ns_x))
    np.testing.assert_allclose(np.asarray(rad_f), np.asarray(rad_x),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_x),
                               atol=1e-4)


def test_multichip_fused_rr_bounces_matches_singledevice():
    """Kernel-vs-kernel at bounces>0 (VERDICT r3 #7): the fused sharded
    path at bounces=2 with stochastic rr Fresnel splits must REPRODUCE
    the single-device fused kernel — in-kernel RNG streams are keyed on
    the GLOBAL block id (fused.py::_wave_kernel seed0), so tile
    sharding is RNG-transparent when shard lane counts are BLOCK
    multiples (64x32 = 2048 px = 2 tiles x 1 block here)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from rtf_tpu.parallel.mesh import make_mesh, render_sharded
    scene = build_scene(box_scene(64, 32, with_mesh=False))
    cfg = FAST.with_(min_samples=2, max_samples=2, bounces=2,
                     shadow_min=1, shadow_max=1, gi_mode="none",
                     split_mode="rr")
    mesh2 = make_mesh(n_tile=2, n_spp=1, devices=jax.devices()[:2])
    rad2, hits2, z2, ns2 = render_sharded(scene, cfg, mesh2, seed=0,
                                          fused=True)
    mesh1 = make_mesh(n_tile=1, n_spp=1, devices=jax.devices()[:1])
    rad1, hits1, z1, ns1 = render_sharded(scene, cfg, mesh1, seed=0,
                                          fused=True)
    # identical streams + identical accumulation order (no spp psum):
    # bitwise agreement expected, loose only to float reassociation
    np.testing.assert_array_equal(np.asarray(hits2), np.asarray(hits1))
    np.testing.assert_array_equal(np.asarray(ns2), np.asarray(ns1))
    np.testing.assert_allclose(np.asarray(rad2), np.asarray(rad1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1),
                               atol=1e-6)
    # the rr path must actually have consumed RNG (sanity: a mirror and
    # a glass sphere are in frame, so secondary types exist)
    assert float(np.asarray(rad1).max()) > 0


def test_multichip_gi_caustics_matches_singlechip(small_scene):
    """Photon-map GI + caustic grid on the sharded path == single-chip:
    pm_direct with the exact grid gather (photon_volume off) is fully
    deterministic given the grids, so the sharded render must reproduce
    render_device_host bit-for-bit up to accumulation order (round-2
    VERDICT #4: no caustic grid argument on the sharded side)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax as _jax
    from rtf_tpu.parallel.mesh import make_mesh, render_sharded
    from rtf_tpu.render.renderer import (
        prepare_caustic_grid, prepare_photon_grid, render_device_host,
    )
    cfg = FAST.with_(gi_mode="pm_direct", photon_count=4096,
                     photon_bounces=3, knn_radius=2.5, knn_k=32,
                     caustic_count=4096, caustic_bounces=4,
                     caustic_radius=2.0, photon_volume=False,
                     hemisphere_samples=0)
    grid = prepare_photon_grid(small_scene, cfg, _jax.random.PRNGKey(0))
    cg = prepare_caustic_grid(small_scene, cfg, _jax.random.PRNGKey(0))
    mesh = make_mesh(n_tile=4, n_spp=2)
    rad, hits, z, ns = render_sharded(small_scene, cfg, mesh, seed=0,
                                      gi_grid=grid, caustic_grid=cg)
    erad, ehits, ez, ens = render_device_host(
        small_scene, cfg, jax.random.PRNGKey(0), gi_grid=grid,
        caustic_grid=cg)
    np.testing.assert_array_equal(np.asarray(ehits), np.asarray(hits))
    np.testing.assert_allclose(np.asarray(erad), np.asarray(rad),
                               atol=5e-5, rtol=1e-4)
    assert np.asarray(rad).mean() > 0.01   # the photon light is ON


def test_xla_wavefront_lane_tiling_exact(small_scene, monkeypatch):
    """Host-side lane tiling of the XLA wavefront (the fix that makes
    full-feature configs viable at 800x600 on the tunneled TPU, round-2
    VERDICT #5) is bit-exact vs the untiled loop, including a tiling
    that needs lane padding."""
    import jax as _jax
    from rtf_tpu.render.renderer import render_device_host
    cfg = FAST.with_(min_samples=2, max_samples=4,
                     variance_threshold=1e-4)
    key = _jax.random.PRNGKey(0)
    base = render_device_host(small_scene, cfg, key)
    # 64*48 = 3072 lanes; budget 1000 -> 3 exact 1024-lane tiles
    monkeypatch.setenv("RTF_XLA_TILE_LANES", "1000")
    tiled = render_device_host(small_scene, cfg, key)
    for a, b in zip(base, tiled):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # 40x31 = 1240 lanes; budget 700 -> 2 x 1024 with 808 padded lanes
    ragged = build_scene(box_scene(40, 31, with_mesh=False))
    monkeypatch.delenv("RTF_XLA_TILE_LANES")
    base_r = render_device_host(ragged, cfg, key)
    monkeypatch.setenv("RTF_XLA_TILE_LANES", "700")
    tiled_r = render_device_host(ragged, cfg, key)
    for a, b in zip(base_r, tiled_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_gi_hemisphere_adds_bounce_light(small_scene):
    """Indirect light must brighten the scene vs direct-only."""
    base = render(small_scene, FAST)
    gi = render(small_scene, FAST.with_(gi_mode="hemisphere",
                                        hemisphere_samples=4))
    assert gi.radiance.mean() > base.radiance.mean() * 1.02
    # color bleeding: wall colors leak onto the white floor near them
    assert np.isfinite(gi.radiance).all()


def test_render_photon_mode_smoke(small_scene):
    import jax
    from rtf_tpu.render.renderer import prepare_photon_grid
    cfg = FAST.with_(gi_mode="photon", hemisphere_samples=2,
                     photon_count=4096, photon_bounces=3,
                     knn_radius=2.0, knn_k=50)
    grid = prepare_photon_grid(small_scene, cfg, jax.random.PRNGKey(0))
    assert int(grid.n_valid) > 200
    res = render(small_scene, cfg, gi_grid=grid)
    assert np.isfinite(res.radiance).all()
    base = render(small_scene, FAST)
    assert res.radiance.mean() > base.radiance.mean()


def test_glossy_reflection_blurs():
    """Proj10 glossy reflections: perturbed-normal children change the
    reflected image but conserve energy (main.cpp:633-659)."""
    import numpy as _np
    desc = box_scene(48, 36, with_mesh=False)
    desc_g = box_scene(48, 36, with_mesh=False)
    changed = 0
    for nm, m in desc_g.materials.items():
        if _np.asarray(m.reflection.color).max() > 0:
            m.reflection_glossiness = 0.3
            changed += 1
    assert changed
    cfg = FAST.with_(min_samples=4, max_samples=4, bounces=2)
    sharp = render(build_scene(desc), cfg, seed=5)
    glossy = render(build_scene(desc_g), cfg, seed=5)
    assert np.isfinite(glossy.radiance).all()
    ms, mg = sharp.radiance.mean(), glossy.radiance.mean()
    assert abs(mg / ms - 1.0) < 0.1          # energy conserved
    # the reflected image actually changed
    assert np.abs(glossy.radiance - sharp.radiance).max() > 0.05


def test_render_caustics_add_light(small_scene):
    """Opt-in caustic map estimate (the reference ships it commented
    out, Proj13 main.cpp:517-534): refracted-light photons brighten the
    floor under the glass sphere."""
    import jax
    from rtf_tpu.render.renderer import prepare_caustic_grid
    cfg = FAST.with_(caustic_count=8192, caustic_bounces=4,
                     caustic_radius=2.0, knn_k=50)
    cg = prepare_caustic_grid(small_scene, cfg, jax.random.PRNGKey(0))
    assert int(cg.n_valid) > 20
    res = render(small_scene, cfg, caustic_grid=cg)
    base = render(small_scene, cfg)
    assert np.isfinite(res.radiance).all()
    assert res.radiance.mean() > base.radiance.mean()


def test_render_pm_direct_mode(small_scene):
    """pm_direct: photon map replaces the analytic light loop for
    diffuse; image is lit and finite, and has no direct-light term."""
    import jax
    from rtf_tpu.render.renderer import prepare_photon_grid
    cfg = FAST.with_(gi_mode="pm_direct", photon_count=8192,
                     photon_bounces=4, knn_radius=2.5, knn_k=64,
                     bounces=1)
    grid = prepare_photon_grid(small_scene, cfg, jax.random.PRNGKey(0))
    res = render(small_scene, cfg, gi_grid=grid)
    assert np.isfinite(res.radiance).all()
    # photon-lit (dim under the non-inverse-square test profile, but
    # clearly nonzero), and DARKER than analytic direct lighting
    assert res.radiance.mean() > 1e-3
    direct = render(small_scene, FAST)
    assert res.radiance.mean() < direct.radiance.mean()
