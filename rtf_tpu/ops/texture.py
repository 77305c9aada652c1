"""Texture sampling as batched atlas gathers.

Semantics:
* TextureFile::Sample — tiled bilinear lookup (texture.cpp:95-121);
  v goes top-down exactly like the lodepng row order the reference indexes.
* TextureChecker::Sample — 2x2 checker (texture.cpp:125-133).
* TextureMap — per-map uvw transform applied first (scene.h:376-398).
* TexturedColor::Sample — color * texture (scene.h:422-423).
* TexturedColor::SampleEnvironment — angular-map projection
  (scene.h:426-432).

The reference's 32-sample elliptic footprint filter (scene.h:331-349) is
dead code in practice: duvw is initialized to zero (scene.h:163) and
`calculateduvw` is disabled in every project, so Sample(uvw,duvw) always
takes the single-sample early-out.  We therefore sample once per hit.
"""
from __future__ import annotations

import jax.numpy as jnp

from rtf_tpu.core.math import mat3_apply_batched

from rtf_tpu.scene.build import TEX_CHECKER, TEX_FILE


def _tile(u):
    """TileClamp (scene.h:356-366): fractional part in [0,1)."""
    return u - jnp.floor(u)


def sample_texture(scene, tex_id: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Sample texture(s) `tex_id` [N] at uvw [N,3] -> [N,3]."""
    tx = scene.textures
    kind = tx.kind[tex_id]
    w = tx.width[tex_id]
    h = tx.height[tex_id]
    row0 = tx.row0[tex_id]

    u = _tile(uvw[..., 0])
    v = _tile(uvw[..., 1])

    # ---- file texture: tiled bilinear
    x = w * u
    y = h * v
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - ix
    fy = y - iy
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    ixp = jnp.where(ix + 1 >= w, 0, ix + 1)
    iyp = jnp.where(iy + 1 >= h, 0, iy + 1)
    atlas = scene.textures.atlas
    c00 = atlas[row0 + iy, ix]
    c10 = atlas[row0 + iy, ixp]
    c01 = atlas[row0 + iyp, ix]
    c11 = atlas[row0 + iyp, ixp]
    fxe = fx[..., None]
    fye = fy[..., None]
    file_col = (c00 * (1 - fxe) * (1 - fye) + c10 * fxe * (1 - fye)
                + c01 * (1 - fxe) * fye + c11 * fxe * fye)

    # ---- checker
    odd = (u <= 0.5) ^ (v <= 0.5)
    chk_col = jnp.where(odd[..., None], tx.c2[tex_id], tx.c1[tex_id])

    return jnp.where((kind == TEX_FILE)[..., None], file_col, chk_col)


def sample_texmap(scene, tm_id: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Sample texmap(s) with uvw transform; tm_id == -1 -> 1.0 (no map)."""
    safe = jnp.maximum(tm_id, 0)
    itm = scene.texmaps.itm[safe]
    pos = scene.texmaps.pos[safe]
    u = mat3_apply_batched(itm, uvw - pos)
    col = sample_texture(scene, scene.texmaps.tex[safe], u)
    return jnp.where((tm_id >= 0)[..., None], col, jnp.ones_like(col))


def sample_textured_color(scene, color, tm_id: jnp.ndarray, uvw: jnp.ndarray):
    """TexturedColor::Sample — `color` is [3] or [N,3], tm_id is [N]."""
    return jnp.asarray(color) * sample_texmap(scene, tm_id, uvw)


def env_uvw(direction: jnp.ndarray) -> jnp.ndarray:
    """Angular-map uv for environment sampling (scene.h:426-432)."""
    d = direction
    z = jnp.arcsin(jnp.clip(-d[..., 2], -1.0, 1.0)) / jnp.pi + 0.5
    denom = jnp.abs(d[..., 0]) + jnp.abs(d[..., 1])
    denom = jnp.where(denom == 0, 1e-30, denom)
    x = d[..., 0] / denom
    y = d[..., 1] / denom
    u = 0.5 + z * 0.5 * (x - y)
    v = 0.5 + z * 0.5 * (x + y)
    return jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)


def sample_environment(scene, direction: jnp.ndarray) -> jnp.ndarray:
    """environment.SampleEnvironment(dir) with scene.env color & map."""
    n = direction.shape[0]
    uvw = env_uvw(direction)
    tm = jnp.full((n,), scene.env_tm, jnp.int32)
    return sample_textured_color(scene, scene.env_color, tm, uvw)


def sample_background(scene, uvw: jnp.ndarray) -> jnp.ndarray:
    n = uvw.shape[0]
    tm = jnp.full((n,), scene.bg_tm, jnp.int32)
    return sample_textured_color(scene, scene.bg_color, tm, uvw)
