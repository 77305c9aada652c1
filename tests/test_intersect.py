"""Analytic unit tests for intersection kernels (SURVEY.md §4 item (a))."""
import numpy as np
import jax.numpy as jnp

from rtf_tpu.core.math import BIGFLOAT
from rtf_tpu.ops.intersect import (
    intersect_box, intersect_plane, intersect_sphere, intersect_triangle,
    plane_attributes, sphere_attributes,
)


def V(*rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_sphere_front_hit():
    o = V([0, 0, 5])
    d = V([0, 0, -1])
    t, front, valid = intersect_sphere(o, d, jnp.full(1, BIGFLOAT))
    assert bool(valid[0]) and bool(front[0])
    np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
    p, n, uvw = sphere_attributes(o, d, t)
    np.testing.assert_allclose(np.asarray(p[0]), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)
    # uv at the +z pole: v = 0.5 + asin(1)/pi = 1.0
    np.testing.assert_allclose(float(uvw[0, 1]), 1.0, atol=1e-5)


def test_sphere_back_hit_from_inside():
    o = V([0, 0, 0])
    d = V([0, 0, 1])
    t, front, valid = intersect_sphere(o, d, jnp.full(1, BIGFLOAT))
    assert bool(valid[0]) and not bool(front[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-5)


def test_sphere_miss():
    o = V([0, 5, 5])
    d = V([0, 0, -1])
    t, front, valid = intersect_sphere(o, d, jnp.full(1, BIGFLOAT))
    assert not bool(valid[0])


def test_sphere_respects_prev_t():
    o = V([0, 0, 5])
    d = V([0, 0, -1])
    t, front, valid = intersect_sphere(o, d, jnp.full(1, 2.0))
    assert not bool(valid[0])  # hit at t=4 is farther than existing 2.0


def test_plane_hit_and_uv():
    o = V([0.5, -0.25, 3])
    d = V([0, 0, -1])
    t, front, valid = intersect_plane(o, d, jnp.full(1, BIGFLOAT))
    assert bool(valid[0]) and bool(front[0])
    np.testing.assert_allclose(float(t[0]), 3.0, atol=1e-6)
    p, n, uvw = plane_attributes(o, d, t)
    np.testing.assert_allclose(np.asarray(uvw[0]), [0.75, 0.375, 0], atol=1e-6)


def test_plane_outside_unit_square():
    o = V([1.5, 0, 3])
    d = V([0, 0, -1])
    _, _, valid = intersect_plane(o, d, jnp.full(1, BIGFLOAT))
    assert not bool(valid[0])


def test_plane_backface():
    o = V([0, 0, -3])
    d = V([0, 0, 1])
    t, front, valid = intersect_plane(o, d, jnp.full(1, BIGFLOAT))
    assert bool(valid[0]) and not bool(front[0])


def test_triangle_hit_barycentrics():
    a, b, c = V([0, 0, 0]), V([1, 0, 0]), V([0, 1, 0])
    o = V([0.25, 0.25, 2.0])
    d = V([0, 0, -1])
    t, front, ba, bb, valid = intersect_triangle(o, d, a, b, c, jnp.full(1, BIGFLOAT))
    assert bool(valid[0]) and bool(front[0])
    np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-6)
    # p = a*ba + b*bb + c*(1-ba-bb)
    p = ba[0] * a[0] + bb[0] * b[0] + (1 - ba[0] - bb[0]) * c[0]
    np.testing.assert_allclose(np.asarray(p)[:2], [0.25, 0.25], atol=1e-5)


def test_triangle_miss_outside():
    a, b, c = V([0, 0, 0]), V([1, 0, 0]), V([0, 1, 0])
    o = V([0.9, 0.9, 2.0])
    d = V([0, 0, -1])
    _, _, _, _, valid = intersect_triangle(o, d, a, b, c, jnp.full(1, BIGFLOAT))
    assert not bool(valid[0])


def test_triangle_parallel_ray():
    a, b, c = V([0, 0, 0]), V([1, 0, 0]), V([0, 1, 0])
    o = V([0.2, 0.2, 1.0])
    d = V([1, 0, 0])
    _, _, _, _, valid = intersect_triangle(o, d, a, b, c, jnp.full(1, BIGFLOAT))
    assert not bool(valid[0])


def test_box_hit_miss_inside():
    bmin = V([-1, -1, -1])
    bmax = V([1, 1, 1])
    o = V([0, 0, 5])
    d = V([0, 0, -1])
    assert bool(intersect_box(o, d, bmin, bmax, BIGFLOAT)[0])
    o2 = V([3, 3, 5])
    assert not bool(intersect_box(o2, d, bmin, bmax, BIGFLOAT)[0])
    o3 = V([0, 0, 0])  # inside
    assert bool(intersect_box(o3, d, bmin, bmax, BIGFLOAT)[0])
    # behind the ray
    o4 = V([0, 0, -5])
    assert not bool(intersect_box(o4, d, bmin, bmax, BIGFLOAT)[0])


def test_box_axis_parallel_outside():
    bmin = V([-1, -1, -1])
    bmax = V([1, 1, 1])
    o = V([5, 0, 0])
    d = V([0, 0, -1])  # parallel to z, outside x slab
    assert not bool(intersect_box(o, d, bmin, bmax, BIGFLOAT)[0])
