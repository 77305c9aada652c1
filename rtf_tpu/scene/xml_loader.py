"""Scene XML loader.

Implements the exact element/attribute grammar of the reference's loader
(xmlload.cpp:65-554): <xml><scene>…</scene><camera>…</camera></xml>, with
recursive <object> nodes, value-scaled colors/vectors (xmlload.cpp:453-487),
nested <scale>/<rotate>/<translate> applied in document order, deferred
material binding by name, checkerboard + file textures with their own
transforms, and OBJ nodes that synthesize a multi-material from their MTL
(xmlload.cpp:200-244).
"""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

from rtf_tpu.core.transform import Transform
from rtf_tpu.scene.model import (
    CameraDesc, LightDesc, MaterialDesc, NodeDesc, SceneDesc,
    TexMapDesc, TextureDesc, TexturedColorDesc,
)
from rtf_tpu.scene.obj_loader import load_obj
from rtf_tpu.utils.png import read_png


def _tag(e) -> str:
    return e.tag.lower()


def _read_float(e, default: float, name: str = "value") -> float:
    v = e.get(name)
    return float(v) if v is not None else default


def _read_vector(e, default) -> np.ndarray:
    """x/y/z attributes override the default, then the whole vector is
    scaled by `value` (ReadVector, xmlload.cpp:453-468)."""
    v = np.array(default, np.float64)
    for i, k in enumerate("xyz"):
        a = e.get(k)
        if a is not None:
            v[i] = float(a)
    return v * _read_float(e, 1.0)


def _read_color(e, default=(1.0, 1.0, 1.0)) -> np.ndarray:
    c = np.array(default, np.float64)
    for i, k in enumerate("rgb"):
        a = e.get(k)
        if a is not None:
            c[i] = float(a)
    return c * _read_float(e, 1.0)


class _Loader:
    def __init__(self, scene_dir: str):
        self.scene_dir = scene_dir
        self.scene = SceneDesc()
        self.texture_cache = {}
        self.pending_mtl = []       # (NodeDesc, mtl_name) — deferred binding

    # ---------------- textures

    def _resolve(self, path: str) -> str:
        for cand in (os.path.join(self.scene_dir, path), path):
            if os.path.exists(cand):
                return cand
        return path

    def load_texture_file(self, name: str) -> Optional[TextureDesc]:
        if name in self.texture_cache:
            return self.texture_cache[name]
        path = self._resolve(name)
        tex = None
        try:
            if path.lower().endswith(".png"):
                img = read_png(path)
            elif path.lower().endswith(".ppm"):
                img = _read_ppm(path)
            else:
                img = None
            if img is not None:
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                img = img[:, :, :3].astype(np.float32) / 255.0
                tex = TextureDesc(kind="file", name=name, data=img)
        except (OSError, ValueError):
            tex = None
        self.texture_cache[name] = tex
        return tex

    def read_texture(self, e) -> Optional[TexMapDesc]:
        """<… texture="name"> with optional nested transform + checker colors
        (ReadTexture, xmlload.cpp:500-531)."""
        name = e.get("texture")
        if name is None:
            return None
        if name.lower() == "checkerboard":
            tex = TextureDesc(kind="checker")
            for child in e:
                if _tag(child) == "color1":
                    tex.color1 = _read_color(child, (0, 0, 0))
                elif _tag(child) == "color2":
                    tex.color2 = _read_color(child, (0, 0, 0))
        else:
            tex = self.load_texture_file(name)
        tm = TexMapDesc(texture=tex)
        _load_transform(tm.transform, e)
        return tm

    def read_textured_color(self, e, default=(1.0, 1.0, 1.0)) -> TexturedColorDesc:
        tc = TexturedColorDesc(_read_color(e, default))
        tc.texmap = self.read_texture(e)
        return tc

    # ---------------- scene elements

    def load_scene_elem(self, scene_elem):
        for child in scene_elem:
            t = _tag(child)
            if t == "background":
                self.scene.background = self.read_textured_color(child)
            elif t == "environment":
                self.scene.environment = self.read_textured_color(child)
            elif t == "object":
                self.load_node(self.scene.root, child)
            elif t == "material":
                self.load_material(child)
            elif t == "light":
                self.load_light(child)

    def load_node(self, parent: NodeDesc, e):
        node = NodeDesc(name=e.get("name") or "")
        parent.children.append(node)
        mtl_name = e.get("material")
        if mtl_name:
            node.mtl_name = mtl_name
        typ = (e.get("type") or "").lower()
        if typ == "sphere":
            node.obj_kind = "sphere"
        elif typ == "plane":
            node.obj_kind = "plane"
        elif typ == "obj":
            # a missing OBJ is a warning, not an error (xmlload.cpp:206-207);
            # repeated names reuse the loaded object (objList.Find,
            # xmlload.cpp:203-210)
            path = self._resolve(node.name)
            cache = getattr(self, "_obj_cache", None)
            if cache is None:
                cache = self._obj_cache = {}
            ckey = (path, mtl_name is None)
            if ckey in cache:
                mesh = cache[ckey]
                if mesh is not None:
                    node.obj_kind = "mesh"
                    node.mesh = mesh
            else:
                try:
                    mesh = load_obj(path, load_mtl_file=(mtl_name is None))
                    node.obj_kind = "mesh"
                    node.mesh = mesh
                except OSError:
                    print(f'ERROR: Cannot load file "{node.name}" — node '
                          f"kept without geometry")
                    mesh = None
                cache[ckey] = mesh
            # OBJ with its own MTL materials -> synthesized multi-material
            # (xmlload.cpp:211-241); builder resolves texture files.
            if mesh is not None and mesh.materials and node.name not in self.scene.materials:
                for sub in mesh.materials:
                    self._resolve_mtl_textures(sub)
        for child in e:
            if _tag(child) == "object":
                self.load_node(node, child)
        _load_transform(node.transform, e)

    def _resolve_mtl_textures(self, mtl: MaterialDesc):
        map_kd = getattr(mtl, "_map_kd", None)
        map_ks = getattr(mtl, "_map_ks", None)
        if map_kd:
            tex = self.load_texture_file(map_kd)
            if tex is not None:
                mtl.diffuse.texmap = TexMapDesc(texture=tex)
        if map_ks:
            # the reference (quirk) also binds map_Ks to the DIFFUSE slot
            # (xmlload.cpp:223) — keep the sane behaviour instead.
            tex = self.load_texture_file(map_ks)
            if tex is not None:
                mtl.specular.texmap = TexMapDesc(texture=tex)

    def load_material(self, e):
        if (e.get("type") or "").lower() != "blinn":
            return
        m = MaterialDesc(name=e.get("name") or "")
        for child in e:
            t = _tag(child)
            if t == "diffuse":
                m.diffuse = self.read_textured_color(child)
            elif t == "specular":
                m.specular = self.read_textured_color(child)
            elif t == "glossiness":
                m.glossiness = _read_float(child, 1.0)
            elif t == "emission":
                m.emission = self.read_textured_color(child)
            elif t == "reflection":
                m.reflection = self.read_textured_color(child)
                m.reflection_glossiness = _read_float(child, 0.0, "glossiness")
            elif t == "refraction":
                m.refraction = self.read_textured_color(child)
                m.ior = _read_float(child, 1.0, "index")
                m.refraction_glossiness = _read_float(child, 0.0, "glossiness")
            elif t == "absorption":
                m.absorption = _read_color(child)
        self.scene.materials[m.name] = m

    def load_light(self, e):
        typ = (e.get("type") or "").lower()
        if typ not in ("ambient", "direct", "point"):
            return
        li = LightDesc(kind=typ, name=e.get("name") or "")
        for child in e:
            t = _tag(child)
            if t == "intensity":
                li.intensity = _read_color(child)
            elif t == "direction":
                d = _read_vector(child, (1, 1, 1))
                n = np.linalg.norm(d)
                li.direction = d / n if n > 0 else d
            elif t == "position":
                li.position = _read_vector(child, (0, 0, 0))
            elif t == "size":
                li.size = _read_float(child, 0.0)
        self.scene.lights.append(li)

    def load_camera(self, e):
        cam = CameraDesc()
        target = cam.pos + cam.dir   # camera.dir += camera.pos (xmlload.cpp:111)
        for child in e:
            t = _tag(child)
            if t == "position":
                cam.pos = _read_vector(child, cam.pos)
            elif t == "target":
                target = _read_vector(child, target)
            elif t == "up":
                cam.up = _read_vector(child, cam.up)
            elif t == "fov":
                cam.fov = _read_float(child, cam.fov)
            elif t == "focaldist":
                cam.focaldist = _read_float(child, cam.focaldist)
            elif t == "dof":
                cam.dof = _read_float(child, cam.dof)
            elif t == "width":
                cam.width = int(_read_float(child, cam.width))
            elif t == "height":
                cam.height = int(_read_float(child, cam.height))
        d = target - cam.pos
        cam.dir = d / np.linalg.norm(d)
        x = np.cross(cam.dir, cam.up)
        up = np.cross(x, cam.dir)
        cam.up = up / np.linalg.norm(up)
        self.scene.camera = cam


def _load_transform(trans: Transform, e):
    """Apply <scale>/<rotate>/<translate> children in document order
    (LoadTransform, xmlload.cpp:265-291)."""
    for child in e:
        t = _tag(child)
        if t == "scale":
            s = _read_vector(child, (1, 1, 1))
            trans.scale(s[0], s[1], s[2])
        elif t == "rotate":
            axis = _read_vector(child, (0, 0, 0))
            n = np.linalg.norm(axis)
            axis = axis / n if n > 0 else axis
            angle = _read_float(child, 0.0, "angle")
            trans.rotate(axis, angle)
        elif t == "translate":
            trans.translate(_read_vector(child, (0, 0, 0)))


def _read_ppm(path: str) -> np.ndarray:
    """Binary P6 PPM (texture.cpp:32-53)."""
    with open(path, "rb") as f:
        data = f.read()
    tokens = []
    i = 0
    while len(tokens) < 4 and i < len(data):
        # skip whitespace/comments
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    if tokens[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h = int(tokens[1]), int(tokens[2])
    i += 1  # single whitespace after maxval
    return np.frombuffer(data[i : i + w * h * 3], np.uint8).reshape(h, w, 3).copy()


def load_scene(path: str) -> SceneDesc:
    """Parse a scene XML file into a SceneDesc (LoadScene, xmlload.cpp:65).

    Comments are stripped lexically first: the reference scenes contain
    nested `<!--` openers that tinyxml tolerates but strict XML rejects.
    """
    with open(path, "r", errors="replace") as f:
        text = f.read()
    text = re.sub(r"<!--.*?-->", "", text, flags=re.S)
    xml = ET.fromstring(text)
    if _tag(xml) != "xml":
        xml = xml.find("xml") or xml
    scene_elem = None
    cam_elem = None
    for child in xml:
        if _tag(child) == "scene":
            scene_elem = child
        elif _tag(child) == "camera":
            cam_elem = child
    if scene_elem is None:
        raise ValueError(f"{path}: no <scene> element")
    loader = _Loader(os.path.dirname(os.path.abspath(path)))
    loader.load_scene_elem(scene_elem)
    if cam_elem is not None:
        loader.load_camera(cam_elem)
    return loader.scene
