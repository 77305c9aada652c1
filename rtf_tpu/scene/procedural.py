"""Procedural demo scenes (no file assets required).

Used by tests, __graft_entry__, and bench fallbacks.  `box_scene`
reproduces the shape of the Proj13 box scene (scene.xml: Cornell-style
plane box + two spheres + teapot stand-in + one point light) without
touching the reference checkout.
"""
from __future__ import annotations

import numpy as np

from rtf_tpu.core.transform import Transform
from rtf_tpu.scene.model import (
    CameraDesc, LightDesc, MaterialDesc, MeshDesc, NodeDesc, SceneDesc,
    TexturedColorDesc,
)


def _mtl(name, diffuse, specular=(0.7, 0.7, 0.7), gloss=20.0,
         reflection=(0, 0, 0), refraction=(0, 0, 0), ior=1.0,
         absorption=(0, 0, 0), emission=(0, 0, 0)) -> MaterialDesc:
    m = MaterialDesc(name=name)
    m.diffuse = TexturedColorDesc(np.array(diffuse, np.float64))
    m.specular = TexturedColorDesc(np.array(specular, np.float64))
    m.glossiness = gloss
    m.reflection = TexturedColorDesc(np.array(reflection, np.float64))
    m.refraction = TexturedColorDesc(np.array(refraction, np.float64))
    m.ior = ior
    m.absorption = np.array(absorption, np.float64)
    m.emission = TexturedColorDesc(np.array(emission, np.float64))
    return m


def _node(name, kind, mtl, transform: Transform, mesh=None) -> NodeDesc:
    n = NodeDesc(name=name, obj_kind=kind, mtl_name=mtl, mesh=mesh)
    n.transform = transform
    return n


def icosphere_mesh(subdiv: int = 2) -> MeshDesc:
    """Small procedural triangle mesh (subdivided icosahedron)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    for _ in range(subdiv):
        verts = list(map(tuple, v))
        index = {tuple(p): i for i, p in enumerate(verts)}

        def mid(i, j):
            p = v[i] + v[j]
            p = tuple(p / np.linalg.norm(p))
            if p not in index:
                index[p] = len(verts)
                verts.append(p)
            return index[p]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(verts, np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        f = np.array(nf, np.int64)
    mesh = MeshDesc(name="icosphere")
    mesh.v = v.astype(np.float32)
    mesh.f = f.astype(np.int32)
    mesh.face_mtl = np.zeros(len(f), np.int32)
    mesh.compute_normals()
    return mesh


def box_scene(width: int = 200, height: int = 150,
              with_mesh: bool = True, light_size: float = 0.0,
              dof: float = 0.0, mesh_subdiv: int = 2) -> SceneDesc:
    """Cornell-style box + reflective & refractive spheres (+ icosphere
    mesh), structurally equivalent to the Proj13 box scene."""
    s = SceneDesc()
    box = NodeDesc(name="box")
    box.transform = Transform().translate([0, 0, 12])
    box.children = [
        _node("floor", "plane", "wall", Transform().scale(32).translate([0, 0, -12])),
        _node("ceiling", "plane", "wall", Transform().scale(32).rotate([1, 0, 0], 180).translate([0, 0, 12])),
        _node("back", "plane", "wall", Transform().scale(32).rotate([1, 0, 0], 90).translate([0, 20, 0])),
        _node("left", "plane", "wallRed", Transform().scale(32).rotate([0, 1, 0], 90).translate([-15, 0, 0])),
        _node("right", "plane", "wallBlue", Transform().scale(32).rotate([0, 1, 0], -90).translate([15, 0, 0])),
    ]
    s.root.children.append(box)
    s.root.children.append(
        _node("mirror", "sphere", "mirror", Transform().scale(4).translate([8, -6, 4])))
    s.root.children.append(
        _node("glass", "sphere", "glass", Transform().scale(4).translate([-8, -6, 4])))
    if with_mesh:
        s.root.children.append(
            _node("ball", "mesh", "redball",
                  Transform().scale(3).translate([1, 4, 3]),
                  mesh=icosphere_mesh(mesh_subdiv)))

    s.materials = {
        "wall": _mtl("wall", (1, 1, 1), specular=(0, 0, 0)),
        "wallRed": _mtl("wallRed", (1, 0.5, 0.5), specular=(0, 0, 0)),
        "wallBlue": _mtl("wallBlue", (0.5, 0.5, 1), specular=(0, 0, 0)),
        "mirror": _mtl("mirror", (0, 0, 0), specular=(1, 1, 1), gloss=80,
                       reflection=(1, 1, 1)),
        "glass": _mtl("glass", (0, 0, 0), specular=(1, 1, 1), gloss=80,
                      refraction=(1, 1, 1), ior=1.52),
        "redball": _mtl("redball", (1.0, 0.3, 0.3)),
    }
    s.lights = [LightDesc(kind="point", name="L",
                          intensity=np.full(3, 100.5),
                          position=np.array([0.0, 0.0, 22.0]),
                          size=light_size)]
    cam = CameraDesc()
    cam.pos = np.array([0.0, -60.0, 12.0])
    target = np.array([0.0, 0.0, 12.0])
    d = target - cam.pos
    cam.dir = d / np.linalg.norm(d)
    cam.up = np.array([0.0, 0.0, 1.0])
    x = np.cross(cam.dir, cam.up)
    up = np.cross(x, cam.dir)
    cam.up = up / np.linalg.norm(up)
    cam.fov = 30.0
    cam.width = width
    cam.height = height
    cam.dof = dof
    s.camera = cam
    return s
