"""Tracing tests: BVH vs brute force property test, scene closest-hit."""
import jax
import numpy as np
import jax.numpy as jnp

from rtf_tpu.core.math import BIGFLOAT
from rtf_tpu.ops.bvh import build_mesh_bvh
from rtf_tpu.ops.intersect import intersect_triangle
from rtf_tpu.scene.build import build_scene
from rtf_tpu.scene.procedural import box_scene, icosphere_mesh


def _brute_force_hits(v, f, o, d):
    """Closest triangle hit per ray by testing every face."""
    t_best = np.full(len(o), BIGFLOAT, np.float32)
    f_best = np.full(len(o), -1, np.int64)
    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    for i, (i0, i1, i2) in enumerate(f):
        a = jnp.asarray(v[i0])
        b = jnp.asarray(v[i1])
        c = jnp.asarray(v[i2])
        t, fr, ba, bb, valid = intersect_triangle(oj, dj, a, b, c,
                                                  jnp.asarray(t_best))
        t = np.asarray(t)
        valid = np.asarray(valid)
        upd = valid & (t < t_best)
        t_best[upd] = t[upd]
        f_best[upd] = i
    return t_best, f_best


def test_bvh_matches_brute_force():
    mesh = icosphere_mesh(2)
    rng = np.random.default_rng(7)
    n = 256
    o = rng.normal(size=(n, 3)).astype(np.float32) * 3
    # aim roughly at the sphere
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_ref, f_ref = _brute_force_hits(mesh.v, mesh.f, o, d)

    from rtf_tpu.scene.model import NodeDesc, SceneDesc, MaterialDesc
    from rtf_tpu.scene.build import _Builder
    # build arena through the real builder
    import rtf_tpu.scene.build as B
    desc_node = NodeDesc(name="m", obj_kind="mesh", mesh=mesh, mtl_name=None)
    builder = _Builder(SceneDesc())
    builder.add_mesh(desc_node, 0)
    arena = builder.pack_meshes()

    from rtf_tpu.ops.trace import bvh_traverse
    nrays = len(o)
    t0 = jnp.full((nrays,), BIGFLOAT, jnp.float32)
    z = jnp.zeros((nrays,), jnp.int32)
    zf = jnp.zeros((nrays,), jnp.float32)
    fronts = jnp.ones((nrays,), bool)
    t, face, front, ba, bb = bvh_traverse(
        arena, arena.slot_root[0], jnp.asarray(o), jnp.asarray(d),
        t0, z, fronts, zf, zf)
    t = np.asarray(t)
    face = np.asarray(face)

    hit_ref = t_ref < BIGFLOAT / 2
    hit_bvh = t < BIGFLOAT / 2
    np.testing.assert_array_equal(hit_bvh, hit_ref)
    np.testing.assert_allclose(t[hit_bvh], t_ref[hit_ref], rtol=1e-4)
    # faces may differ only where two triangles are equidistant (edges)
    same = face[hit_bvh] == f_ref[hit_ref]
    assert same.mean() > 0.98


def test_scene_closest_hit_and_shadow():
    from rtf_tpu.ops.trace import trace, resolve_surface, trace_shadow
    scene = build_scene(box_scene(64, 48, with_mesh=False))
    # ray down the view axis must hit the back wall (y=20 plane)
    o = jnp.asarray(np.array([[0, -60, 12]], np.float32))
    d = jnp.asarray(np.array([[0, 1, 0]], np.float32))
    hit = trace(scene, o, d)
    assert bool(hit.is_hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 80.0, rtol=1e-5)
    surf = resolve_surface(scene, o, d, hit)
    np.testing.assert_allclose(np.asarray(surf.p)[0], [0, 20, 12], atol=1e-3)
    # normal faces the camera
    assert float(surf.n[0, 1]) < -0.99

    # shadow: point below the mirror sphere at (8,-6,4), r=4 -> light above
    p = jnp.asarray(np.array([[8, -6, -0.5]], np.float32))
    to_light = jnp.asarray(np.array([[0, 0, 22.5]], np.float32)) - p
    sh = trace_shadow(scene, p, to_light, 1.0)
    assert float(sh[0]) == 0.0  # occluded by the sphere
    # unoccluded point
    p2 = jnp.asarray(np.array([[0, -15, 0.5]], np.float32))
    sh2 = trace_shadow(scene, p2, jnp.asarray([[0, 15.0, 21.5]]), 1.0)
    assert float(sh2[0]) == 1.0


def test_trace_sphere_inside_back_hit():
    from rtf_tpu.ops.trace import trace
    scene = build_scene(box_scene(64, 48, with_mesh=False))
    # origin inside the glass sphere at (-8,-6,4) r=4: must hit back side
    o = jnp.asarray(np.array([[-8, -6, 4]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    hit = trace(scene, o, d)
    assert bool(hit.is_hit[0])
    assert not bool(hit.front[0])
    np.testing.assert_allclose(float(hit.t[0]), 4.0, rtol=1e-4)


def test_pallas_mesh_matches_dense():
    """Pallas closest-hit kernel (interpret mode) == dense jnp path on
    random rays against the box-scene teapot mesh."""
    import dataclasses
    from rtf_tpu.ops.trace import trace
    scene_d = build_scene(box_scene(64, 48, with_mesh=True))
    scene_d = dataclasses.replace(scene_d, mesh_algo="dense")
    scene_p = dataclasses.replace(scene_d, mesh_algo="pallas_interpret")

    rng = np.random.default_rng(7)
    n = 257  # deliberately not a multiple of the ray block
    # rays aimed from random points toward the mesh region
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    o[:, 2] = rng.uniform(0, 20, n)
    target = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    hd = trace(scene_d, o, d)
    hp = trace(scene_p, o, d)
    np.testing.assert_array_equal(np.asarray(hd.kind), np.asarray(hp.kind))
    np.testing.assert_allclose(np.asarray(hd.t), np.asarray(hp.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hd.face), np.asarray(hp.face))
    np.testing.assert_allclose(np.asarray(hd.ba), np.asarray(hp.ba),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hd.front), np.asarray(hp.front))


def test_pallas_mesh_culling_coherent_rays():
    """Coherent (camera) ray blocks exercise the kernel's per-tile AABB
    culling; results must still match the dense path exactly."""
    import dataclasses
    from rtf_tpu.ops.trace import trace
    from rtf_tpu.render.camera import pixel_order, primary_rays
    scene_d = build_scene(box_scene(128, 96, with_mesh=True))
    scene_d = dataclasses.replace(scene_d, mesh_algo="dense")
    scene_p = dataclasses.replace(scene_d, mesh_algo="pallas_interpret")
    order = jnp.asarray(pixel_order(128, 96))
    px, py = order % 128, order // 128
    o, d = primary_rays(scene_d, px, py, jnp.zeros_like(px),
                        key=jax.random.PRNGKey(0))
    hd = trace(scene_d, o, d)
    hp = trace(scene_p, o, d)
    assert int(np.asarray(hd.kind == 3).sum()) > 100  # mesh visibly hit
    np.testing.assert_array_equal(np.asarray(hd.kind), np.asarray(hp.kind))
    np.testing.assert_allclose(np.asarray(hd.t), np.asarray(hp.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hd.face), np.asarray(hp.face))
