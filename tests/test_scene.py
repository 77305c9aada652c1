"""Scene XML/OBJ loader + builder tests against reference scene files."""
import os

import numpy as np
import pytest

from rtf_tpu.scene import load_scene, build_scene
from rtf_tpu.scene.obj_loader import load_obj

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@needs_ref
def test_load_proj3_scene():
    desc = load_scene(f"{REF}/RayTracingProj3/RayTracingProj3/input2.xml")
    # 5 wall spheres under the box node + 2 spheres
    def count(node):
        return (1 if node.obj_kind else 0) + sum(count(c) for c in node.children)
    assert count(desc.root) == 7
    assert set(desc.materials) == {"wall", "wallRed", "wallBlue", "mtl1", "mtl2"}
    assert [l.kind for l in desc.lights] == ["ambient", "point"]
    np.testing.assert_allclose(desc.lights[1].position, [0, 0, 22])
    # ReadColor value-scaling: wall diffuse = 0.7 * (1,1,1)
    np.testing.assert_allclose(desc.materials["wall"].diffuse.color, [0.7] * 3)
    cam = desc.camera
    assert (cam.width, cam.height) == (800, 600)
    np.testing.assert_allclose(cam.pos, [0, -60, 12])
    # camera orthonormalization (xmlload.cpp:124-127)
    np.testing.assert_allclose(np.dot(cam.dir, cam.up), 0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(cam.dir), 1, atol=1e-12)


@needs_ref
def test_load_proj13_scene_with_mesh():
    desc = load_scene(f"{REF}/RayTracingProj13/RayTracingProj13/scene.xml")
    meshes = []
    def walk(n):
        if n.obj_kind == "mesh":
            meshes.append(n)
        for c in n.children:
            walk(c)
    walk(desc.root)
    assert len(meshes) == 1
    assert meshes[0].mesh.num_faces > 1000   # teapot
    scene = build_scene(desc)
    assert scene.num_planes == 5
    assert scene.num_spheres == 2
    assert scene.num_mesh_inst == 1
    # refractive material present with ior 1.52
    iors = np.asarray(scene.materials.ior)
    assert np.isclose(iors.max(), 1.52)


@needs_ref
def test_material_value_quirks():
    # scene_b.xml's "vakye" typo must leave specular at the default (1,1,1)
    desc = load_scene(f"{REF}/RayTracingFinal/RayTracingFinal/data/scene_b.xml")
    m = desc.materials["redc"]
    np.testing.assert_allclose(m.specular.color, [1, 1, 1])
    np.testing.assert_allclose(m.diffuse.color, [0, 0, 0])  # value="0"
    np.testing.assert_allclose(m.absorption, [0.000001, 1, 1])
    assert m.ior == 1.52


@needs_ref
def test_obj_loader_teapot():
    mesh = load_obj(f"{REF}/RayTracingProj13/RayTracingProj13/teapot.obj",
                    load_mtl_file=False)
    assert mesh.num_faces > 1000
    assert mesh.v.shape[1] == 3
    assert mesh.vn is not None and len(mesh.vn) > 0
    # normals normalized
    lens = np.linalg.norm(mesh.vn, axis=1)
    np.testing.assert_allclose(lens[lens > 0], 1.0, atol=1e-4)


def test_transform_flattening_equivalence():
    """Flattened world transform == nested node transforms (exactness of
    replacing the recursive ToNodeCoords chain)."""
    from rtf_tpu.core.transform import Transform
    parent = Transform().scale(2, 1, 3).rotate([0, 0, 1], 40).translate([1, 2, 3])
    child = Transform().rotate([1, 0, 0], -25).translate([0, 1, 0])
    flat = parent.compose(child)
    rng = np.random.default_rng(1)
    for p in rng.normal(size=(10, 3)):
        step = parent.transform_from(child.transform_from(p))
        np.testing.assert_allclose(flat.transform_from(p), step, atol=1e-12)
        np.testing.assert_allclose(
            child.transform_to(parent.transform_to(step)), p, atol=1e-9)


def test_procedural_scene_builds():
    from rtf_tpu.scene.procedural import box_scene
    scene = build_scene(box_scene(64, 48))
    assert scene.num_planes == 5
    assert scene.num_spheres == 2
    assert scene.num_mesh_inst == 1
    assert scene.mesh.tri_a.shape[0] == 320  # icosphere subdiv 2


def test_mesh_instancing_shares_slot(tmp_path):
    """Two <object type=obj> nodes naming the same file share one mesh
    arena slot (objList.Find reuse, xmlload.cpp:203-210)."""
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    xml = tmp_path / "s.xml"
    xml.write_text(f"""<xml><scene>
      <object type="obj" name="{obj.name}" material="m">
        <translate x="-1"/>
      </object>
      <object type="obj" name="{obj.name}" material="m">
        <translate x="1"/>
      </object>
      <material type="blinn" name="m"><diffuse value="0.5"/></material>
      <light type="ambient" name="a"><intensity value="1"/></light>
    </scene><camera><position z="5"/><target x="0"/><width value="8"/>
    <height value="6"/></camera></xml>""")
    from rtf_tpu.scene import build_scene, load_scene
    scene = build_scene(load_scene(str(xml)))
    assert scene.num_mesh_inst == 2
    assert scene.mesh_inst_slots == (0, 0)          # shared slot
    assert scene.mesh.tri_a.shape[0] == 1           # ONE face stored


def test_loader_sweeps_all_reference_scenes():
    """Every scene XML in the reference loads and builds (missing OBJ
    files warn and continue, matching xmlload.cpp:206-207)."""
    import glob
    import os
    import pytest
    from tests.conftest import REFERENCE, reference_available
    if not reference_available():
        pytest.skip("no reference")
    from rtf_tpu.scene import build_scene, load_scene
    xmls = sorted(glob.glob(f"{REFERENCE}/**/*.xml", recursive=True))
    scenes = [x for x in xmls
              if "<scene" in open(x, errors="ignore").read(4000)]
    assert len(scenes) >= 15
    cwd = os.getcwd()
    loaded = 0
    try:
        for x in scenes:
            os.chdir(os.path.dirname(x))
            desc = load_scene(x)
            desc.camera.width, desc.camera.height = 16, 12
            s = build_scene(desc)
            assert s.width == 16
            loaded += 1
    finally:
        os.chdir(cwd)
    assert loaded == len(scenes)
