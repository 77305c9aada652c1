"""Progressive screen-space irradiance cache (gi/irradiance_cache.py,
the working version of the reference's unused cyIrradianceMap)."""
import jax
import numpy as np
import pytest

from rtf_tpu.render.config import RenderConfig
from rtf_tpu.render.renderer import render
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene

GI = RenderConfig(min_samples=2, max_samples=2, bounces=1,
                  shadow_min=1, shadow_max=1, gi_mode="hemisphere",
                  hemisphere_samples=8, split_mode="rr")


@pytest.fixture(scope="module")
def scene():
    return build_scene(box_scene(48, 36, with_mesh=False))


def test_cache_build_and_sparsity(scene):
    from rtf_tpu.gi.irradiance_cache import build_irradiance_cache
    cache = build_irradiance_cache(scene, GI, jax.random.PRNGKey(0),
                                   max_spacing=8)
    E = np.asarray(cache.E)
    assert E.shape == (48 * 36, 3)
    assert np.isfinite(E).all()
    assert E.max() > 0.01              # bounce light exists in the box
    frac = float(np.asarray(cache.computed).mean())
    # the point of the cache: most pixels interpolate, few compute
    assert 0.0 < frac < 0.6


def test_cache_render_tracks_full_gi(scene):
    """Cached-GI render stays close to the brute-force hemisphere GI
    render in the mean and adds light over direct-only."""
    from rtf_tpu.gi.irradiance_cache import render_with_cache
    full = render(scene, GI, seed=1)
    direct = render(scene, GI.with_(gi_mode="none"), seed=1)
    cached, cache = render_with_cache(scene, GI, jax.random.PRNGKey(1))
    m_full = float(full.radiance.mean())
    m_dir = float(direct.radiance.mean())
    m_cache = float(cached.radiance.mean())
    assert m_full > m_dir * 1.02       # GI adds energy
    assert m_cache > m_dir * 1.02      # ... through the cache too
    # mean indirect energy agrees within a generous MC band
    ind_full = m_full - m_dir
    ind_cache = m_cache - m_dir
    assert 0.5 < ind_cache / ind_full < 1.7
    assert np.isfinite(cached.radiance).all()


def test_cache_fused_evaluator_matches(scene):
    """The fused-kernel E evaluator (synthetic surface through
    fused_gi_chunks) agrees with the XLA evaluator in the mean."""
    from rtf_tpu.gi.irradiance_cache import build_irradiance_cache
    xla = build_irradiance_cache(scene, GI, jax.random.PRNGKey(2),
                                 max_spacing=8)
    fused = build_irradiance_cache(scene, GI, jax.random.PRNGKey(2),
                                   max_spacing=8, evaluator="fused")
    ex = float(np.asarray(xla.E).mean())
    ef = float(np.asarray(fused.E).mean())
    assert ex > 0 and ef > 0
    assert 0.8 < ef / ex < 1.25
