"""Vector math on batched [..., 3] arrays.

The reference carries cy::Point3f scalar vectors (cyPoint.h); here every
operation is batched over a leading wavefront dimension so the VPU sees
long contiguous lanes.  All functions are shape-polymorphic over leading
dims and operate on the trailing axis.
"""
from __future__ import annotations

import jax.numpy as jnp

# Matches BIGFLOAT in the reference (scene.h:56) — the "no hit" sentinel z.
BIGFLOAT = 1.0e30


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis; keeps no trailing dim."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_sq(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(a))


def normalize(a: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Safe normalize; zero vectors stay (near) zero instead of NaN."""
    return a * jax_rsqrt(jnp.maximum(length_sq(a), eps))[..., None]


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, 1.0 / jnp.sqrt(x), 0.0)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror direction of view vector v (pointing AWAY from surface) about n.

    rDir = 2 N (N.V) - V   (ref: Final/main.cpp:597)
    """
    return 2.0 * n * dot(n, v)[..., None] - v


def luma(c: jnp.ndarray) -> jnp.ndarray:
    """Gray() of the reference color type: plain channel average
    (cyColor.h:83)."""
    return jnp.mean(c, axis=-1)


def mat3_apply(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[3,3] matrix times batched [...,3] vectors — expanded to explicit
    multiply-adds so it runs on the VPU in full float32.

    NEVER use einsum/@ for these: XLA routes tiny matmuls to the MXU,
    which on TPU computes in bfloat16 by default — a 4e-3 relative error
    on ray transforms that shows up as geometry banding (measured: TPU
    div/sqrt are 1-ulp, matmul is not).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
        m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
        m[2, 0] * x + m[2, 1] * y + m[2, 2] * z,
    ], axis=-1)


def mat3_apply_batched(ms: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Per-row [N,3,3] matrices times [N,3] vectors on the VPU (f32)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        ms[..., 0, 0] * x + ms[..., 0, 1] * y + ms[..., 0, 2] * z,
        ms[..., 1, 0] * x + ms[..., 1, 1] * y + ms[..., 1, 2] * z,
        ms[..., 2, 0] * x + ms[..., 2, 1] * y + ms[..., 2, 2] * z,
    ], axis=-1)


def offset_origin(p: jnp.ndarray, n: jnp.ndarray, d: jnp.ndarray,
                  eps: float = 1e-4) -> jnp.ndarray:
    """Nudge a secondary-ray origin off the surface along the normal,
    toward the side the new direction d leaves through.

    The reference instead relies on per-primitive t epsilons of 1e-3
    (objects.h:31,85,228), which measured in shadow-ray units (|dir| =
    distance to the light) sits exactly at the float32 self-intersection
    scale on its large scaled-sphere walls — producing banding.  A
    magnitude-relative normal offset is robust at any scene scale.
    """
    scale = eps * (1.0 + jnp.max(jnp.abs(p), axis=-1, keepdims=True))
    side = jnp.where(dot(n, d)[..., None] >= 0, 1.0, -1.0)
    return p + n * scale * side


def orthonormal_basis(n: jnp.ndarray):
    """Build tangent/bitangent for normal n with the reference's rule
    (materials.h:50-59 createCoordinateSystem):
      Nt = N x (1,0,0) if N.(1,0,0) < 0.4 else N x (0,0,1); Nb = N x Nt.
    """
    v1 = jnp.array([1.0, 0.0, 0.0], n.dtype)
    v2 = jnp.array([0.0, 0.0, 1.0], n.dtype)
    use_v1 = (dot(n, jnp.broadcast_to(v1, n.shape)) < 0.4)[..., None]
    nt = jnp.where(use_v1, cross(n, v1), cross(n, v2))
    nt = normalize(nt)
    nb = cross(n, nt)
    return nt, nb
