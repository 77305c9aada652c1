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

TPU layout notes (measured on v5e over the tunneled backend): a gather
of 480k indices costs ~35 ms REGARDLESS of table size or layout, while
an elementwise op on the same lanes is ~2 ms.  So (a) per-texture /
per-map table attributes use unrolled where-chains instead of gathers
(tables are tiny), and (b) the four bilinear corners ride ONE gather of
[4N] linearized indices into the flattened atlas instead of four.
"""
from __future__ import annotations

import jax.numpy as jnp

from rtf_tpu.core.math import mat3_apply_batched

from rtf_tpu.scene.build import TEX_CHECKER, TEX_FILE

_SEL_MAX = 32   # unrolled-select budget; larger tables fall back to take


def _sel_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] without a gather for small tables: an unrolled
    where-chain over rows (X elementwise selects beat one gather by
    ~20x at wavefront sizes)."""
    x = table.shape[0]
    if x > _SEL_MAX:
        return jnp.take(table, jnp.clip(idx, 0, x - 1), axis=0)
    extra = (1,) * (table.ndim - 1)
    out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    for i in range(1, x):
        m = (idx == i).reshape(idx.shape + extra)
        out = jnp.where(m, table[i], out)
    return out


def sample_texture(scene, tex_id: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Sample texture(s) `tex_id` [N] at uvw [N,3] -> [N,3]."""
    tx = scene.textures
    kind = _sel_rows(tx.kind, tex_id)

    u = _tile(uvw[..., 0])
    v = _tile(uvw[..., 1])

    # ---- file texture: tiled bilinear, all 4 corners in ONE gather
    if scene.has_file_tex:
        w = _sel_rows(tx.width, tex_id)
        h = _sel_rows(tx.height, tex_id)
        row0 = _sel_rows(tx.row0, tex_id)
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
        atlas = tx.atlas
        aw = atlas.shape[1]
        flat = atlas.reshape(-1, 3)
        lin = jnp.stack([(row0 + iy) * aw + ix,
                         (row0 + iy) * aw + ixp,
                         (row0 + iyp) * aw + ix,
                         (row0 + iyp) * aw + ixp])          # [4, N]
        cs = jnp.take(flat, lin.reshape(-1), axis=0)
        cs = cs.reshape((4,) + u.shape + (3,))
        fxe = fx[..., None]
        fye = fy[..., None]
        file_col = (cs[0] * (1 - fxe) * (1 - fye) + cs[1] * fxe * (1 - fye)
                    + cs[2] * (1 - fxe) * fye + cs[3] * fxe * fye)
    else:
        file_col = jnp.zeros(u.shape + (3,), jnp.float32)

    # ---- checker
    odd = (u <= 0.5) ^ (v <= 0.5)
    chk_col = jnp.where(odd[..., None], _sel_rows(tx.c2, tex_id),
                        _sel_rows(tx.c1, tex_id))

    return jnp.where((kind == TEX_FILE)[..., None], file_col, chk_col)


def _tile(u):
    """TileClamp (scene.h:356-366): fractional part in [0,1)."""
    return u - jnp.floor(u)


def sample_texmap(scene, tm_id: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Sample texmap(s) with uvw transform; tm_id == -1 -> 1.0 (no map)."""
    safe = jnp.maximum(tm_id, 0)
    itm = _sel_rows(scene.texmaps.itm, safe)
    pos = _sel_rows(scene.texmaps.pos, safe)
    u = mat3_apply_batched(itm, uvw - pos)
    col = sample_texture(scene, _sel_rows(scene.texmaps.tex, safe), u)
    return jnp.where((tm_id >= 0)[..., None], col, jnp.ones_like(col))


def sample_texmap_filtered(scene, tm_id, uvw, duv0, duv1,
                           n_samples: int = 32):
    """Elliptic footprint filtering — Texture::Sample(uvw, duvw)
    (scene.h:331-349, TEXTURE_SAMPLE_COUNT=32): averages `n_samples`
    texture taps over the ellipse spanned by duv0/duv1 ([N,2] uv-space
    footprint vectors from ops.trace.footprint_duv).  Tap i>0 lies at
    Halton_2(i), Halton_3(i) mapped to a radius-0.5 disk, exactly the
    reference's mapping.  The per-map uvw transform applies inside each
    tap (linear), matching TextureMap semantics."""
    import math

    from rtf_tpu.core.halton import halton_np
    zero = jnp.zeros(uvw.shape[:-1] + (1,), uvw.dtype)
    d0 = jnp.concatenate([duv0, zero], axis=-1)
    d1 = jnp.concatenate([duv1, zero], axis=-1)
    acc = sample_texmap(scene, tm_id, uvw)
    for i in range(1, n_samples):
        hx = float(halton_np(i, 2))
        hy = float(halton_np(i, 3))
        r = math.sqrt(hx) * 0.5
        x = r * math.sin(2.0 * math.pi * hy)
        y = r * math.cos(2.0 * math.pi * hy)
        acc = acc + sample_texmap(scene, tm_id, uvw + x * d0 + y * d1)
    return acc / float(n_samples)


def sample_textured_color(scene, color, tm_id: jnp.ndarray, uvw: jnp.ndarray,
                          duv=None, n_filter: int = 32):
    """TexturedColor::Sample — `color` is [3] or [N,3], tm_id is [N].
    duv=(duv0, duv1) enables footprint filtering (scene.h:331-349)."""
    if duv is not None:
        tex = sample_texmap_filtered(scene, tm_id, uvw, duv[0], duv[1],
                                     n_samples=n_filter)
    else:
        tex = sample_texmap(scene, tm_id, uvw)
    return jnp.asarray(color) * tex


def env_uvw(direction: jnp.ndarray, l2: bool = False) -> jnp.ndarray:
    """Angular-map uv for environment sampling (scene.h:426-432).

    The xy-projection normalization is an ERA quirk: Proj7's scene.h
    divides by the Euclidean norm sqrt(x^2+y^2)+1e-10 (Proj7
    scene.h:461-463); Proj8 through Final divide by the L1 norm
    |x|+|y| (Final scene.h:428-430).  `l2=True` selects the Proj7
    behavior (cfg.env_l2)."""
    d = direction
    z = jnp.arcsin(jnp.clip(-d[..., 2], -1.0, 1.0)) / jnp.pi + 0.5
    if l2:
        denom = jnp.sqrt(d[..., 0] * d[..., 0]
                         + d[..., 1] * d[..., 1]) + 1e-10
    else:
        denom = jnp.abs(d[..., 0]) + jnp.abs(d[..., 1])
        denom = jnp.where(denom == 0, 1e-30, denom)
    x = d[..., 0] / denom
    y = d[..., 1] / denom
    u = 0.5 + z * 0.5 * (x - y)
    v = 0.5 + z * 0.5 * (x + y)
    return jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)


def sample_environment(scene, direction: jnp.ndarray,
                       l2: bool = False) -> jnp.ndarray:
    """environment.SampleEnvironment(dir) with scene.env color & map."""
    n = direction.shape[0]
    if scene.env_tm < 0:     # static: no map -> plain color, no sampling
        return jnp.broadcast_to(scene.env_color, (n, 3))
    uvw = env_uvw(direction, l2=l2)
    tm = jnp.full((n,), scene.env_tm, jnp.int32)
    return sample_textured_color(scene, scene.env_color, tm, uvw)


def sample_background(scene, uvw: jnp.ndarray) -> jnp.ndarray:
    n = uvw.shape[0]
    if scene.bg_tm < 0:      # static: no map -> plain color
        return jnp.broadcast_to(scene.bg_color, (n, 3))
    tm = jnp.full((n,), scene.bg_tm, jnp.int32)
    return sample_textured_color(scene, scene.bg_color, tm, uvw)


# ---------------------------------------------------------------------------
# channelwise variants (per-lane u, v scalars; tuple-of-[N] outputs) for
# the segmented fused path — no [N,3] intermediates


def sample_texture_ch(scene, tex_id, u, v):
    """Channelwise sample_texture: returns (r, g, b) [N] tuples."""
    tx = scene.textures
    kind = _sel_rows(tx.kind, tex_id)
    u = _tile(u)
    v = _tile(v)

    if scene.has_file_tex:
        w = _sel_rows(tx.width, tex_id)
        h = _sel_rows(tx.height, tex_id)
        row0 = _sel_rows(tx.row0, tex_id)
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
        atlas = tx.atlas
        aw = atlas.shape[1]
        flat = atlas.reshape(-1, 3)
        lin = jnp.stack([(row0 + iy) * aw + ix,
                         (row0 + iy) * aw + ixp,
                         (row0 + iyp) * aw + ix,
                         (row0 + iyp) * aw + ixp])          # [4, N]
        cs = jnp.take(flat, lin.reshape(-1), axis=0)
        cs = cs.reshape((4,) + u.shape + (3,))
        w00 = (1 - fx) * (1 - fy)
        w10 = fx * (1 - fy)
        w01 = (1 - fx) * fy
        w11 = fx * fy
        file_c = [cs[0][..., c] * w00 + cs[1][..., c] * w10
                  + cs[2][..., c] * w01 + cs[3][..., c] * w11
                  for c in range(3)]
    else:
        file_c = [jnp.zeros_like(u)] * 3

    odd = (u <= 0.5) ^ (v <= 0.5)
    out = []
    is_file = kind == TEX_FILE
    for c in range(3):
        chk = jnp.where(odd, _sel_rows(tx.c2[:, c], tex_id),
                        _sel_rows(tx.c1[:, c], tex_id))
        out.append(jnp.where(is_file, file_c[c], chk))
    return tuple(out)


def sample_texmap_ch(scene, tm_id, u, v):
    """Channelwise sample_texmap; tm_id == -1 lanes return 1.0."""
    safe = jnp.maximum(tm_id, 0)

    def e(i, j):
        return _sel_rows(scene.texmaps.itm[:, i, j], safe)

    def p(i):
        return _sel_rows(scene.texmaps.pos[:, i], safe)

    du = u - p(0)
    dv = v - p(1)
    lu = e(0, 0) * du + e(0, 1) * dv - e(0, 2) * p(2)
    lv = e(1, 0) * du + e(1, 1) * dv - e(1, 2) * p(2)
    tex = _sel_rows(scene.texmaps.tex, safe)
    cols = sample_texture_ch(scene, tex, lu, lv)
    no_map = tm_id < 0
    return tuple(jnp.where(no_map, 1.0, c) for c in cols)


def env_uv_ch(dx, dy, dz, l2=False):
    """Channelwise env_uvw (angular map, scene.h:426-432; `l2` selects
    the Proj7-era Euclidean xy normalization — see env_uvw)."""
    z = jnp.arcsin(jnp.clip(-dz, -1.0, 1.0)) / jnp.pi + 0.5
    if l2:
        denom = jnp.sqrt(dx * dx + dy * dy) + 1e-10
    else:
        denom = jnp.abs(dx) + jnp.abs(dy)
        denom = jnp.where(denom == 0, 1e-30, denom)
    x = dx / denom
    y = dy / denom
    return 0.5 + z * 0.5 * (x - y), 0.5 + z * 0.5 * (x + y)
