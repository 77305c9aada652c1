"""Camera ray generation.

Reproduces the reference's camera model exactly (RenderPixel,
Final/main.cpp:205-224): image plane at the focal distance, pixel grid
top-left origin with y growing down, Halton-jittered subpixel offsets
(main.cpp:147-162 generateSample), and thin-lens DOF sampling
(main.cpp:246-262).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rtf_tpu.core.halton import halton
from rtf_tpu.core.math import mat3_apply, normalize


def image_plane_params(scene):
    """(u, v, b): pixel steps and the center of pixel (0,0) in camera space
    (main.cpp:205-216)."""
    l = scene.focaldist
    h = 2.0 * l * np.tan(scene.fov / 2.0 * (np.pi / 180.0))
    w = h * float(scene.width) / float(scene.height)
    u = w / scene.width
    v = -h / scene.height
    b = np.array([-w / 2.0 + u / 2.0, h / 2.0 + v / 2.0, -l], np.float32)
    return float(u), float(v), b


def primary_rays(scene, px: jnp.ndarray, py: jnp.ndarray,
                 sample_idx: jnp.ndarray, key=None,
                 halton_bases=(2, 3), dof: bool = False):
    """Generate world-space primary rays.

    px, py: [N] integer pixel coords; sample_idx: [N] Halton index j of the
    subpixel sample (the reference jitters by Halton(j,2)*u, Halton(j,3)*v
    from the pixel's top-left-centered base, main.cpp:147-162).
    Returns (o [N,3], d [N,3] normalized).
    """
    u, v, b = image_plane_params(scene)
    sx = halton(sample_idx, halton_bases[0]) * u
    sy = halton(sample_idx, halton_bases[1]) * v
    cx = px.astype(jnp.float32) * u + b[0] + sx
    cy = py.astype(jnp.float32) * v + b[1] + sy
    cz = jnp.full_like(cx, b[2])
    target_cam = jnp.stack([cx, cy, cz], axis=-1)   # point on focal plane

    if dof and scene.dof > 0 and key is not None:
        k1, k2 = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(k1, px.shape)) * scene.dof
        ang = jax.random.uniform(k2, px.shape) * (2.0 * jnp.pi)
        lens_cam = jnp.stack(
            [r * jnp.cos(ang), r * jnp.sin(ang), jnp.zeros_like(r)], axis=-1)
        d_campos = mat3_apply(scene.cam_m, lens_cam)  # world offset
    else:
        d_campos = jnp.zeros_like(target_cam)

    d_world = mat3_apply(scene.cam_m, target_cam) - d_campos
    o = scene.cam_pos[None, :] + d_campos
    return o, normalize(d_world)


def primary_rays_ch(scene, px: jnp.ndarray, py: jnp.ndarray,
                    sample_idx: jnp.ndarray, key=None,
                    halton_bases=(2, 3), dof: bool = False):
    """Channelwise primary_rays: same math, but every array stays 1-D
    [N] (the TPU-friendly layout — [N,3] arrays use 3 of 128 vector
    lanes).  Returns ((ox,oy,oz), (dx,dy,dz)) with d normalized."""
    u, v, b = image_plane_params(scene)
    sx = halton(sample_idx, halton_bases[0]) * u
    sy = halton(sample_idx, halton_bases[1]) * v
    cx = px.astype(jnp.float32) * u + b[0] + sx
    cy = py.astype(jnp.float32) * v + b[1] + sy
    cz = jnp.full_like(cx, b[2])

    m = scene.cam_m
    if dof and scene.dof > 0 and key is not None:
        k1, k2 = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(k1, px.shape)) * scene.dof
        ang = jax.random.uniform(k2, px.shape) * (2.0 * jnp.pi)
        lx = r * jnp.cos(ang)
        ly = r * jnp.sin(ang)
        off = [m[i, 0] * lx + m[i, 1] * ly for i in range(3)]
    else:
        off = [jnp.zeros_like(cx) for _ in range(3)]

    dw = [m[i, 0] * cx + m[i, 1] * cy + m[i, 2] * cz - off[i]
          for i in range(3)]
    inv = jax.lax.rsqrt(jnp.maximum(
        dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2], 1e-30))
    d3 = tuple(dw[i] * inv for i in range(3))
    o3 = tuple(scene.cam_pos[i] + off[i] for i in range(3))
    return o3, d3


def pixel_grid(width: int, height: int):
    """Flat [P] pixel coordinate arrays (row-major like the pixel iterator,
    main.cpp:71-78: x = i % W, y = i / W)."""
    idx = jnp.arange(width * height, dtype=jnp.int32)
    return idx % width, idx // width


import functools


@functools.lru_cache(maxsize=32)
def pixel_order(width: int, height: int, tw: int = 32, th: int = 16):
    """Tile-coherent pixel permutation: flat pixel ids ordered so that
    consecutive lanes form tw x th screen tiles (ragged edges fold into
    their tile row).  Wavefront blocks of 512 lanes then subtend a small
    solid angle, which is what makes the Pallas kernel's per-block AABB
    culling effective.  Returns an int32 [P] numpy array; lane k handles
    pixel id order[k]."""
    idx = np.arange(width * height, dtype=np.int32)
    px = idx % width
    py = idx // width
    order = np.lexsort((px % tw, py % th, px // tw, py // th))
    return order.astype(np.int32)


@functools.lru_cache(maxsize=32)
def pixel_order_inv(width: int, height: int, tw: int = 32, th: int = 16):
    """Inverse of pixel_order: inv[pixel_id] = lane index."""
    return np.argsort(pixel_order(width, height, tw, th)).astype(np.int32)
