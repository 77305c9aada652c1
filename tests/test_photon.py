"""Photon map tests: deterministic-seed statistics (SURVEY.md §4 (d)),
grid gather vs brute-force kNN-area estimate, .dat roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtf_tpu.gi.grid import build_photon_grid, estimate_irradiance
from rtf_tpu.gi.io import load_photon_dat, save_photon_dat, PHOTON_DTYPE
from rtf_tpu.gi.photon import PhotonMapData, shoot_photons
from rtf_tpu.render.config import RenderConfig
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene

CFG = RenderConfig(photon_bounces=4)


@pytest.fixture(scope="module")
def scene():
    return build_scene(box_scene(64, 48, with_mesh=False))


@pytest.fixture(scope="module")
def photons(scene):
    return shoot_photons(scene, CFG, n_emit=4096, capacity=8192,
                         key=jax.random.PRNGKey(0))


def test_photons_land_on_geometry(scene, photons):
    n = int(photons.count)
    assert n > 500   # a good fraction of 4096 photons stored
    pos = np.asarray(photons.pos)[:n]
    lo = np.asarray(scene.world_min) - 1e-2
    hi = np.asarray(scene.world_max) + 1e-2
    assert ((pos >= lo) & (pos <= hi)).all()
    # stored photons must sit ON a surface: box walls at x=+-15, y=20,
    # z in {0, 24} (floor plane at z=0), or the spheres
    on_wall = (np.isclose(np.abs(pos[:, 0]), 15, atol=1e-2)
               | np.isclose(pos[:, 1], 20, atol=1e-2)
               | np.isclose(pos[:, 2], 0, atol=1e-2)
               | np.isclose(pos[:, 2], 24, atol=1e-2))
    # walls are the only diffuse surfaces in this scene -> all stores there
    assert on_wall.mean() > 0.99
    # power scaled by 4pi/N: all finite positive
    pw = np.asarray(photons.power)[:n]
    assert np.isfinite(pw).all() and (pw >= 0).all()


def test_photon_shoot_deterministic(scene):
    a = shoot_photons(scene, CFG, 512, 1024, jax.random.PRNGKey(7))
    b = shoot_photons(scene, CFG, 512, 1024, jax.random.PRNGKey(7))
    assert int(a.count) == int(b.count)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_grid_estimate_matches_bruteforce(scene, photons):
    grid = build_photon_grid(photons, cell_size=2.0,
                             bounds_min=scene.world_min,
                             bounds_max=scene.world_max)
    # query on the floor near the center
    q = jnp.asarray(np.array([[0.0, 0.0, 0.01], [5.0, 5.0, 0.01]], np.float32))
    nrm = jnp.asarray(np.array([[0, 0, 1], [0, 0, 1]], np.float32))
    irrad, mdir = estimate_irradiance(grid, q, nrm, radius=2.0, k=10 ** 9)
    # brute force with the same (radius-capped, k=inf) estimator
    n = int(photons.count)
    pos = np.asarray(photons.pos)[:n]
    pw = np.asarray(photons.power)[:n]
    dirs = np.asarray(photons.dir)[:n]
    for qi in range(2):
        d2 = ((pos - np.asarray(q)[qi]) ** 2).sum(1)
        sel = (d2 < 4.0) & (dirs @ np.asarray(nrm)[qi] < 0)
        want = pw[sel].sum(0) / (np.pi * 4.0)
        np.testing.assert_allclose(np.asarray(irrad)[qi], want, rtol=2e-3,
                                   atol=1e-5)


def _np_knn_oracle(pos, dirs, pw, q, radius, k, nrm=None):
    """Reference bounded-heap semantics (cyPhotonMap.h:288-336,
    :365-440): keep the k nearest accepted photons; dist2[0] (the area
    radius) is the k-th nearest distance when >k photons are in range,
    else the cap radius."""
    d2 = ((pos - q) ** 2).sum(1)
    ok = d2 < radius * radius
    if nrm is not None:
        ok &= dirs @ nrm < 0
    d2s = np.sort(d2[ok])
    if len(d2s) > k:
        r2 = d2s[k - 1]
        sel = ok & (d2 <= r2)
    else:
        r2 = radius * radius
        sel = ok
    return pw[sel].sum(0) / (np.pi * r2)


def test_exact_knn_at_density_gradient():
    """Exact bounded-k estimate vs the brute-force k-nearest oracle at a
    caustic-like clustered distribution — exactly where the legacy
    uniform-density radius shrink is wrong (VERDICT.md round-1 #6)."""
    rng = np.random.RandomState(11)
    n_cluster, n_bg = 3000, 800
    pc = rng.normal(0, 0.35, (n_cluster, 3)).astype(np.float32)
    pb = rng.uniform(-8, 8, (n_bg, 3)).astype(np.float32)
    pos = np.concatenate([pc, pb])
    n = len(pos)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pw = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    pm = PhotonMapData(pos=jnp.asarray(pos), dir=jnp.asarray(dirs),
                       power=jnp.asarray(pw), count=jnp.int32(n))
    radius, k = 2.0, 64
    grid = build_photon_grid(pm, radius, (-8, -8, -8), (8, 8, 8))
    # queries spanning the density gradient: cluster core, shoulder,
    # sparse background
    q = np.array([[0, 0, 0], [0.3, 0, 0], [0.8, 0.4, 0.2],
                  [2.5, 0, 0], [6, 6, 6]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (len(q), 1))
    irr, _ = estimate_irradiance(grid, jnp.asarray(q), jnp.asarray(nrm),
                                 radius=radius, k=k, exact=True,
                                 max_per_cell=4096)
    for qi in range(len(q)):
        want = _np_knn_oracle(pos, dirs, pw, q[qi], radius, k, nrm[qi])
        np.testing.assert_allclose(np.asarray(irr)[qi], want,
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=f"query {qi}")


def test_exact_knn_dense_cell_beyond_legacy_cap():
    """A caustic-like cluster packing >>128 photons into ONE grid cell:
    the gathers must see every photon (VERDICT round-2 #3 — the old
    hardcoded max_per_cell=128 silently truncated dense cells; the
    reference kd-tree has no such cap, cyPhotonMap.h:365-440).  Uses
    the DEFAULT max_per_cell (grid-measured occupancy)."""
    rng = np.random.RandomState(3)
    # ~700 photons inside one 1x1x1 cell, plus sparse background
    pc = rng.uniform(0.05, 0.95, (700, 3)).astype(np.float32)
    pb = rng.uniform(-4, 4, (300, 3)).astype(np.float32)
    pos = np.concatenate([pc, pb])
    n = len(pos)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pw = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    pm = PhotonMapData(pos=jnp.asarray(pos), dir=jnp.asarray(dirs),
                       power=jnp.asarray(pw), count=jnp.int32(n))
    radius = 1.0
    grid = build_photon_grid(pm, radius, (-4, -4, -4), (4, 4, 4))
    assert grid.max_occupancy > 128, "setup must exceed the legacy cap"
    q = np.array([[0.5, 0.5, 0.5], [0.9, 0.1, 0.5], [3.0, 3.0, 3.0]],
                 np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (len(q), 1))
    for k in (16, 400, 10 ** 9):
        irr, _ = estimate_irradiance(grid, jnp.asarray(q),
                                     jnp.asarray(nrm), radius=radius, k=k)
        for qi in range(len(q)):
            want = _np_knn_oracle(pos, dirs, pw, q[qi], radius, k, nrm[qi])
            np.testing.assert_allclose(np.asarray(irr)[qi], want,
                                       rtol=2e-3, atol=1e-5,
                                       err_msg=f"k={k} query {qi}")


def test_exact_knn_normal_free_and_filters():
    """Exact path with q_normal=None (volume corners) and the linear /
    quadratic filters normalizes by the true k-th distance."""
    rng = np.random.RandomState(5)
    pos = rng.normal(0, 0.5, (2000, 3)).astype(np.float32)
    dirs = rng.normal(size=(2000, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pw = np.ones((2000, 3), np.float32) * 0.01
    pm = PhotonMapData(pos=jnp.asarray(pos), dir=jnp.asarray(dirs),
                       power=jnp.asarray(pw), count=jnp.int32(2000))
    radius, k = 2.0, 32
    grid = build_photon_grid(pm, radius, (-4, -4, -4), (4, 4, 4))
    q = np.array([[0, 0, 0], [1, 1, 0]], np.float32)
    irr, _ = estimate_irradiance(grid, jnp.asarray(q), None,
                                 radius=radius, k=k, exact=True,
                                 max_per_cell=4096)
    for qi in range(len(q)):
        d2 = ((pos - q[qi]) ** 2).sum(1)
        d2s = np.sort(d2[d2 < radius * radius])
        r2 = d2s[k - 1] if len(d2s) > k else radius * radius
        sel = d2 <= r2
        want = pw[sel].sum(0) / (np.pi * r2)
        np.testing.assert_allclose(np.asarray(irr)[qi], want, rtol=2e-3)
    # linear filter: weights 1 - d/r_k, area pi/3 r_k^2
    irr_l, _ = estimate_irradiance(grid, jnp.asarray(q), None,
                                   radius=radius, k=k, exact=True,
                                   filter_type=1, max_per_cell=4096)
    d2 = ((pos - q[0]) ** 2).sum(1)
    d2s = np.sort(d2[d2 < radius * radius])
    r2 = d2s[k - 1] if len(d2s) > k else radius * radius
    sel = d2 <= r2
    w = 1.0 - np.sqrt(d2[sel]) / np.sqrt(r2)
    want = (pw[sel] * w[:, None]).sum(0) / ((np.pi / 3.0) * r2)
    np.testing.assert_allclose(np.asarray(irr_l)[0], want, rtol=2e-3)


def test_knn_radius_shrink(scene, photons):
    """With a small k the estimate must use a smaller effective area ->
    larger or equal density than the capped-radius estimate."""
    grid = build_photon_grid(photons, cell_size=2.0,
                             bounds_min=scene.world_min,
                             bounds_max=scene.world_max)
    q = jnp.asarray(np.array([[0.0, 0.0, 0.01]], np.float32))
    nrm = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    irr_inf, _ = estimate_irradiance(grid, q, nrm, radius=2.0, k=10 ** 9)
    irr_k, _ = estimate_irradiance(grid, q, nrm, radius=2.0, k=5)
    assert np.asarray(irr_k).sum() >= np.asarray(irr_inf).sum() * 0.5


def test_dat_roundtrip(tmp_path, photons):
    n = int(photons.count)
    path = str(tmp_path / "pm.dat")
    save_photon_dat(path, np.asarray(photons.pos), np.asarray(photons.dir),
                    np.asarray(photons.power), n)
    assert PHOTON_DTYPE.itemsize == 24   # byte-parity with cyPhotonMap
    pos, dirs, power = load_photon_dat(path)
    assert len(pos) == n
    np.testing.assert_allclose(pos, np.asarray(photons.pos)[:n], atol=1e-6)
    # x/y quantized to 1/32767; z is RECONSTRUCTED as sqrt(1-x^2-y^2) (the
    # reference format stores only its sign), so z error blows up for
    # near-horizontal directions — same loss as cyPhotonMap.h:147-178
    d0 = np.asarray(photons.dir)[:n]
    np.testing.assert_allclose(dirs[:, :2], d0[:, :2], atol=2e-4)
    np.testing.assert_allclose(dirs[:, 2], d0[:, 2], atol=0.06)
    np.testing.assert_allclose(power, np.asarray(photons.power)[:n],
                               rtol=2e-2, atol=1e-4)


def test_reference_caustic_dat_loads():
    import os
    path = "/root/reference/PhotonMap/PhotonMap/causticmap.dat"
    if not os.path.exists(path):
        pytest.skip("no reference dat")
    pos, dirs, power = load_photon_dat(path)
    assert len(pos) > 1000
    assert np.isfinite(pos).all()
    lens = np.linalg.norm(dirs, axis=1)
    assert (np.abs(lens - 1) < 0.05).mean() > 0.95


# ---------------------------------------------------------------------------
# irradiance volume (gi/volume.py)


def test_volume_matches_exact_estimate_at_corners(scene, photons):
    """At grid-corner positions the trilinear sample IS the table entry,
    which must equal the normal-test-free exact estimate."""
    from rtf_tpu.gi.volume import build_irradiance_volume, sample_volume
    from rtf_tpu.gi.volume import _estimate_corners
    radius, k = 2.0, 64
    grid = build_photon_grid(photons, radius,
                             scene.world_min, scene.world_max)
    vol = build_irradiance_volume(grid, radius, k,
                                  scene.world_min, scene.world_max)
    # pick some interior corners
    nx, ny, nz = (d + 1 for d in vol.dims)
    ids = np.array([0, nz + 1, (ny * nz) + nz + 1,
                    (nx // 2 * ny + ny // 2) * nz + nz // 2])
    corner_p = (np.asarray(vol.origin)
                + np.stack([ids // (ny * nz), (ids // nz) % ny, ids % nz],
                           -1).astype(np.float32) * vol.cell)
    irr_v, dir_v = sample_volume(vol, jnp.asarray(corner_p))
    irr_e, dir_e = _estimate_corners(grid, jnp.asarray(corner_p),
                                     radius, k, 0)
    np.testing.assert_allclose(np.asarray(irr_v), np.asarray(irr_e),
                               rtol=1e-4, atol=1e-6)


def test_volume_close_to_exact_inside(scene, photons):
    """At random interior points the trilinear field tracks the exact
    estimator (same photons, smooth field)."""
    from rtf_tpu.gi.volume import build_irradiance_volume, sample_volume
    radius, k = 2.0, 400
    grid = build_photon_grid(photons, radius,
                             scene.world_min, scene.world_max)
    vol = build_irradiance_volume(grid, radius, k,
                                  scene.world_min, scene.world_max)
    key = jax.random.PRNGKey(3)
    lo = jnp.asarray(scene.world_min) + radius
    hi = jnp.asarray(scene.world_max) - radius
    q = jax.random.uniform(key, (256, 3)) * (hi - lo) + lo
    up = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (256, 1))
    irr_v, _ = sample_volume(vol, q)
    irr_e, _ = estimate_irradiance(grid, q, up, radius, k)
    # normal-test-free volume can only see MORE photons; overall scale
    # must match within the field's smoothness
    mv = float(jnp.mean(jnp.sum(irr_v, -1)))
    me = float(jnp.mean(jnp.sum(irr_e, -1)))
    assert mv > 0 and me > 0
    assert 0.5 < mv / me < 2.5


def test_nearest_photon_matches_bruteforce():
    """nearest_photon == global argmin distance over the whole map
    (cyPhotonMap.h:340-361 GetNearestPhoton is unbounded)."""
    from rtf_tpu.gi.grid import nearest_photon
    rng = np.random.RandomState(7)
    n, cap = 1500, 2048  # exercise the padded-capacity masking
    pos = rng.uniform(-8, 8, (cap, 3)).astype(np.float32)
    dirs = rng.normal(size=(cap, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pw = rng.uniform(0.1, 1.0, (cap, 3)).astype(np.float32)
    pm = PhotonMapData(pos=jnp.asarray(pos), dir=jnp.asarray(dirs),
                       power=jnp.asarray(pw), count=jnp.int32(n))
    grid = build_photon_grid(pm, 2.0, (-8, -8, -8), (8, 8, 8))
    q = rng.uniform(-10, 10, (33, 3)).astype(np.float32)  # some outside
    gp, gd, gw, gd2 = nearest_photon(grid, jnp.asarray(q),
                                     photon_chunk=512)
    for qi in range(len(q)):
        d2 = ((pos[:n] - q[qi]) ** 2).sum(1)
        j = int(np.argmin(d2))
        np.testing.assert_allclose(np.asarray(gd2)[qi], d2[j], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gp)[qi], pos[j], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gw)[qi], pw[j], rtol=1e-6)


def test_nearest_photon_empty_map():
    from rtf_tpu.gi.grid import nearest_photon
    pm = PhotonMapData(pos=jnp.zeros((64, 3)), dir=jnp.zeros((64, 3)),
                       power=jnp.zeros((64, 3)), count=jnp.int32(0))
    grid = build_photon_grid(pm, 1.0, (-1, -1, -1), (1, 1, 1))
    gp, gd, gw, gd2 = nearest_photon(grid, jnp.zeros((4, 3)))
    assert bool(jnp.all(jnp.isinf(gd2)))
    assert bool(jnp.all(gw == 0.0))


def test_cap_occupancy_unbiased_and_bounded():
    """cap_occupancy (volume-bake occupancy cap): structure is a valid
    packed grid, per-cell flux is conserved, and the irradiance
    estimate on the capped grid matches the exact one closely on a
    dense cloud (the thinning is power-rescaled, so density*power —
    the quantity both estimator regimes measure — is preserved)."""
    from rtf_tpu.gi.grid import cap_occupancy
    rng = np.random.RandomState(11)
    # dense core: ~3000 photons on a PLANE patch inside one 1x1x1 cell
    # (photons live on surfaces — the estimator's pi*r^2 area
    # normalization and the cap's thinning-invariance both assume the
    # 2D regime) + sparse 3D background
    pc = rng.uniform(0.02, 0.98, (3000, 3)).astype(np.float32)
    pc[:, 2] = 0.5
    pb = rng.uniform(-4, 4, (1000, 3)).astype(np.float32)
    pos = np.concatenate([pc, pb])
    n = len(pos)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs[:, 2] = -np.abs(dirs[:, 2])  # all arrive from above (pass the
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)  # normal test)
    pw = rng.uniform(0.4, 0.6, (n, 3)).astype(np.float32)
    pm = PhotonMapData(pos=jnp.asarray(pos), dir=jnp.asarray(dirs),
                      power=jnp.asarray(pw), count=jnp.int32(n))
    grid = build_photon_grid(pm, 1.0, (-4, -4, -4), (4, 4, 4))
    # cap must stay >= a few * k (see build_irradiance_volume): capped
    # cells must remain in the kNN regime, and the thinned k-th radius
    # (~ sqrt(count/cap) * r_k) must stay inside the photon patch
    cap = 512
    assert grid.max_occupancy > cap
    g2 = cap_occupancy(grid, cap)
    # structure
    assert g2.max_occupancy <= cap
    assert int(jnp.max(g2.cell_count)) <= cap
    assert int(g2.n_valid) == int(jnp.sum(jnp.minimum(
        grid.cell_count, cap)))
    np.testing.assert_array_equal(
        np.asarray(g2.cell_start),
        np.concatenate([[0], np.cumsum(np.asarray(g2.cell_count))[:-1]]))
    # per-cell flux conservation (scaled kept power ~= original power)
    cc, cs = np.asarray(grid.cell_count), np.asarray(grid.cell_start)
    cc2, cs2 = np.asarray(g2.cell_count), np.asarray(g2.cell_start)
    p1, p2 = np.asarray(grid.power), np.asarray(g2.power)
    for ci in np.nonzero(cc > cap)[0]:
        f1 = p1[cs[ci]:cs[ci] + cc[ci]].sum(0)
        f2 = p2[cs2[ci]:cs2[ci] + cc2[ci]].sum(0)
        np.testing.assert_allclose(f2, f1, rtol=0.05)
    # estimator agreement: the capped kNN estimate is a noisier draw of
    # the same field (it sees a 1/s random subsample; per-query rel std
    # ~ 1/sqrt(k)), so compare the MEAN over a spread of dense-core
    # queries (bias test) plus a generous per-query band, and exact
    # agreement at a sparse (uncapped-cell) query.
    qs = np.stack(np.meshgrid(np.linspace(0.35, 0.65, 4),
                              np.linspace(0.35, 0.65, 4),
                              indexing="ij"), -1).reshape(-1, 2)
    q = np.concatenate([qs, np.full((16, 1), 0.5, np.float32)],
                       1).astype(np.float32)
    q = jnp.asarray(np.concatenate(
        [q, np.array([[2.5, 2.5, 2.5]], np.float32)]))
    nrm = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32),
                              (len(q), 1)))
    for k in (32, 150):
        a, _ = estimate_irradiance(grid, q, nrm, radius=1.0, k=k)
        b, _ = estimate_irradiance(g2, q, nrm, radius=1.0, k=k)
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b[:16].mean(0), a[:16].mean(0),
                                   rtol=0.12, err_msg=f"k={k} mean")
        # per-query: a ~4-sigma sanity band at rel std ~ 1/sqrt(k)
        np.testing.assert_allclose(b[:16], a[:16], rtol=4.0 / k ** 0.5,
                                   err_msg=f"k={k} per-query")
        np.testing.assert_allclose(b[16], a[16], rtol=1e-5,
                                   err_msg=f"k={k} sparse cell")


def test_estimate_corners_matches_exact_gather():
    """The materialized corner estimator (volume bake) must reproduce
    gi/grid.estimate_irradiance(exact=True, normal-free) including the
    kNN radius shrink and every filter's area normalization."""
    from rtf_tpu.gi.grid import FILTER_CONSTANT, FILTER_LINEAR, \
        FILTER_QUADRATIC
    from rtf_tpu.gi.volume import _estimate_corners
    rng = np.random.RandomState(5)
    pos = rng.uniform(-3, 3, (4000, 3)).astype(np.float32)
    pos[:2000, 2] = 0.0            # a dense floor plane + 3D scatter
    n = len(pos)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pw = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    pm = PhotonMapData(pos=jnp.asarray(pos), dir=jnp.asarray(dirs),
                      power=jnp.asarray(pw), count=jnp.int32(n))
    grid = build_photon_grid(pm, 1.0, (-3, -3, -3), (3, 3, 3))
    q = jnp.asarray(rng.uniform(-2.5, 2.5, (64, 3)).astype(np.float32))
    for ft in (FILTER_CONSTANT, FILTER_LINEAR, FILTER_QUADRATIC):
        for k in (0, 40, 10 ** 6):
            want_i, want_d = estimate_irradiance(
                grid, q, None, radius=1.0, k=k, filter_type=ft,
                exact=True)
            got_i, got_d = _estimate_corners(grid, q, 1.0, k, ft)
            np.testing.assert_allclose(np.asarray(got_i),
                                       np.asarray(want_i),
                                       rtol=2e-5, atol=1e-5,
                                       err_msg=f"ft={ft} k={k}")
            np.testing.assert_allclose(np.asarray(got_d),
                                       np.asarray(want_d),
                                       rtol=1e-3, atol=1e-3,
                                       err_msg=f"dir ft={ft} k={k}")
