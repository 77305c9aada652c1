"""Scene builder: SceneDesc (host) -> GpuScene (device pytree).

This is where the reference's pointer-based scene graph becomes TPU-native
data:

* the recursive Node hierarchy (scene.h:438-514) is flattened into
  per-instance world<->local transform arrays, grouped by primitive type so
  intersection is a batched kernel per group instead of virtual dispatch;
* materials become a table; MultiMtl sub-material dispatch by hInfo.mtlID
  (materials.h:388-405) becomes a per-face global material id gather;
* meshes are pre-indexed into per-face SoA (no vertex index indirection on
  device) with a flattened BVH per mesh, concatenated into one arena;
* file textures are stacked into a single row-atlas so sampling is a pair
  of dynamic gathers.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from rtf_tpu.core.transform import Transform
from rtf_tpu.ops.bvh import build_mesh_bvh
from rtf_tpu.scene.model import (
    MaterialDesc, MeshDesc, NodeDesc, SceneDesc, TexturedColorDesc,
)

F32 = np.float32
I32 = np.int32

LIGHT_AMBIENT, LIGHT_DIRECT, LIGHT_POINT = 0, 1, 2
TEX_FILE, TEX_CHECKER = 0, 1


@struct.dataclass
class InstanceGroup:
    """Instances of one primitive type. itm maps world->local
    (Transformation::TransformTo), nrm = itm^T maps local normals -> world
    (VectorTransformFrom, scene.h:240-243)."""
    itm: jnp.ndarray       # [K,3,3]
    pos: jnp.ndarray       # [K,3]
    nrm: jnp.ndarray       # [K,3,3]
    mtl: jnp.ndarray       # [K] int32 global material id
    mesh_slot: jnp.ndarray  # [K] int32 (mesh group only; else zeros)
    # local->world forward matrix (Transformation::TransformFrom) —
    # needed to reconstruct node-space mesh hit points in world space
    tm: jnp.ndarray = None  # [K,3,3]


@struct.dataclass
class MeshArena:
    """All meshes concatenated; one BVH arena with per-slot roots."""
    tri_a: jnp.ndarray     # [F,3] vertex positions
    tri_b: jnp.ndarray
    tri_c: jnp.ndarray
    tri_na: jnp.ndarray    # [F,3] vertex normals
    tri_nb: jnp.ndarray
    tri_nc: jnp.ndarray
    tri_ta: jnp.ndarray    # [F,3] texture coords
    tri_tb: jnp.ndarray
    tri_tc: jnp.ndarray
    tri_mtl: jnp.ndarray   # [F] int32 global material id
    bvh_min: jnp.ndarray   # [N,3]
    bvh_max: jnp.ndarray   # [N,3]
    bvh_child: jnp.ndarray  # [N] int32 first child (arena-global), -1 = leaf
    bvh_eoff: jnp.ndarray  # [N] int32 offset into bvh_elems
    bvh_ecnt: jnp.ndarray  # [N] int32
    bvh_elems: jnp.ndarray  # [E] int32 arena-global face ids
    slot_root: jnp.ndarray  # [S] int32 root node id per mesh slot
    max_leaf: int = struct.field(pytree_node=False, default=8)
    max_depth: int = struct.field(pytree_node=False, default=32)
    # static per-slot (face_start, face_end) arena ranges for the dense
    # tiled intersection path
    slot_faces: tuple = struct.field(pytree_node=False, default=())
    # packed triangle table for the Pallas kernel (ops/pallas_mesh.py):
    # per-slot [16, F_pad] blocks concatenated along columns
    tri_packed: Optional[jnp.ndarray] = None
    # packed (Morton) face id -> arena face id
    tri_perm: Optional[jnp.ndarray] = None
    # packed per-face attributes for one-gather surface reconstruction:
    # attr_n [F,16]: cols 0-8 = vertex normals a/b/c, col 9 = material id
    # attr_t [F,16]: cols 0-8 = vertex uvw a/b/c
    attr_n: Optional[jnp.ndarray] = None
    attr_t: Optional[jnp.ndarray] = None
    # per-tile culling AABBs, [sum nt, 8]
    tile_aabb: Optional[jnp.ndarray] = None
    # static per-slot (col0, fpad, aabb_row0, nt, (mesh_lo, mesh_hi))
    slot_pack: tuple = struct.field(pytree_node=False, default=())


@struct.dataclass
class MaterialTable:
    diffuse: jnp.ndarray       # [M,3]
    diffuse_tm: jnp.ndarray    # [M] texmap id or -1
    specular: jnp.ndarray
    specular_tm: jnp.ndarray
    emission: jnp.ndarray
    emission_tm: jnp.ndarray
    reflection: jnp.ndarray
    reflection_tm: jnp.ndarray
    refraction: jnp.ndarray
    refraction_tm: jnp.ndarray
    glossiness: jnp.ndarray    # [M]
    refl_gloss: jnp.ndarray
    refr_gloss: jnp.ndarray
    ior: jnp.ndarray
    absorption: jnp.ndarray    # [M,3]


@struct.dataclass
class LightTable:
    kind: jnp.ndarray        # [L] int32
    intensity: jnp.ndarray   # [L,3]
    direction: jnp.ndarray   # [L,3] (direct lights, normalized)
    position: jnp.ndarray    # [L,3] (point lights)
    size: jnp.ndarray        # [L] point-light radius (soft shadows)


@struct.dataclass
class TextureTable:
    atlas: jnp.ndarray   # [R, W, 3] float32; file textures stacked by rows
    kind: jnp.ndarray    # [X] int32
    width: jnp.ndarray   # [X]
    height: jnp.ndarray  # [X]
    row0: jnp.ndarray    # [X] row offset in atlas
    c1: jnp.ndarray      # [X,3] checker colors
    c2: jnp.ndarray


@struct.dataclass
class TexMapTable:
    tex: jnp.ndarray   # [T] int32 texture id
    itm: jnp.ndarray   # [T,3,3] uvw-space world->local (TransformTo)
    pos: jnp.ndarray   # [T,3]


@struct.dataclass
class GpuScene:
    spheres: InstanceGroup
    planes: InstanceGroup
    mesh_inst: InstanceGroup
    mesh: Optional[MeshArena]
    materials: MaterialTable
    lights: LightTable
    textures: TextureTable
    texmaps: TexMapTable
    bg_color: jnp.ndarray     # [3]
    env_color: jnp.ndarray    # [3]
    cam_pos: jnp.ndarray      # [3]
    cam_m: jnp.ndarray        # [3,3] camera->world basis (columns x,up,z)
    bg_tm: int = struct.field(pytree_node=False, default=-1)
    env_tm: int = struct.field(pytree_node=False, default=-1)
    fov: float = struct.field(pytree_node=False, default=40.0)
    focaldist: float = struct.field(pytree_node=False, default=1.0)
    dof: float = struct.field(pytree_node=False, default=0.0)
    width: int = struct.field(pytree_node=False, default=200)
    height: int = struct.field(pytree_node=False, default=150)
    num_spheres: int = struct.field(pytree_node=False, default=0)
    num_planes: int = struct.field(pytree_node=False, default=0)
    num_mesh_inst: int = struct.field(pytree_node=False, default=0)
    num_lights: int = struct.field(pytree_node=False, default=0)
    # static copy of light kinds so shading can specialize per light
    light_kinds: tuple = struct.field(pytree_node=False, default=())
    # static: True when any point light has size > 0 (soft shadows)
    any_soft_light: bool = struct.field(pytree_node=False, default=False)
    # static world-space AABB of all geometry (photon-grid binning,
    # equivalent of rootNode.ComputeChildBoundBox, scene.h:476-489)
    world_min: tuple = struct.field(pytree_node=False, default=(-1.0,) * 3)
    world_max: tuple = struct.field(pytree_node=False, default=(1.0,) * 3)
    # mesh intersection algorithm: 'auto' (Pallas kernel on TPU, dense
    # tiled jnp elsewhere), 'pallas', 'pallas_interpret', 'dense', or
    # 'bvh' (lock-step stack traversal, for very large meshes)
    mesh_algo: str = struct.field(pytree_node=False, default="auto")
    # static instance -> mesh-slot mapping (dense path indexes slot_faces)
    mesh_inst_slots: tuple = struct.field(pytree_node=False, default=())
    # static: any file texture exists (atlas gathers can be skipped)
    has_file_tex: bool = struct.field(pytree_node=False, default=False)
    # static: any material has glossy reflection/refraction (Proj10+)
    any_glossy: bool = struct.field(pytree_node=False, default=False)
    # static: material channels with at least one texture map attached
    # (subset of ("diffuse", "specular") — the ones MtlBlinn::Shade
    # samples with uvw, Final/main.cpp:531-532)
    tm_channels: tuple = struct.field(pytree_node=False, default=())
    # era-dependent intersection epsilon for spheres (Proj3/4 compare
    # the discriminant and t against 0, Proj5+ against 0.001f) — set
    # from RenderConfig.isect_zero by the renderer entry points
    isect_zero: float = struct.field(pytree_node=False, default=1e-3)
    # fidelity mode: evaluate the sphere quadratic in the reference's
    # exact (cancellation-prone) op order so deterministic oracle
    # comparisons agree at grazing-tangent pixels; production keeps the
    # stable re-origined form (ops/intersect.py)
    ref_exact: bool = struct.field(pytree_node=False, default=False)
    # Proj3-era sphere hit policy: min root only, no back hits
    sphere_minroot: bool = struct.field(pytree_node=False, default=False)


# --------------------------------------------------------------------------


class _Builder:
    def __init__(self, desc: SceneDesc, bvh_leaf: int = 8):
        self.desc = desc
        self.bvh_leaf = bvh_leaf
        self.materials: List[MaterialDesc] = []
        self.mtl_index = {}
        self.texmaps = []       # (TextureDesc, Transform)
        self.textures = []      # TextureDesc (unique by id)
        self.tex_index = {}
        self.groups = {"sphere": [], "plane": [], "mesh": []}
        self.meshes: List[dict] = []
        self.wmin = np.full(3, np.inf)
        self.wmax = np.full(3, -np.inf)

    # ---- materials / textures

    def add_material(self, m: MaterialDesc) -> int:
        key = id(m)
        if key in self.mtl_index:
            return self.mtl_index[key]
        idx = len(self.materials)
        self.materials.append(m)
        self.mtl_index[key] = idx
        return idx

    def add_texmap(self, tc: TexturedColorDesc) -> int:
        if tc is None or tc.texmap is None or tc.texmap.texture is None:
            return -1
        tm = tc.texmap
        tid = self.add_texture(tm.texture)
        self.texmaps.append((tid, tm.transform))
        return len(self.texmaps) - 1

    def add_texture(self, tex) -> int:
        key = id(tex)
        if key in self.tex_index:
            return self.tex_index[key]
        idx = len(self.textures)
        self.textures.append(tex)
        self.tex_index[key] = idx
        return idx

    # ---- node flattening

    def flatten(self):
        named = dict(self.desc.materials)
        default_mtl = MaterialDesc(name="__default__")

        def resolve_mtl(node: NodeDesc) -> MaterialDesc:
            if node.mtl_name and node.mtl_name in named:
                return named[node.mtl_name]
            return default_mtl

        def walk(node: NodeDesc, parent_t: Transform):
            world_t = parent_t.compose(node.transform)
            if node.obj_kind is not None:
                mtl = resolve_mtl(node)
                mtl_id = self.add_material(mtl)
                entry = {
                    "itm": world_t.inv.astype(F32),
                    "pos": world_t.pos.astype(F32),
                    "nrm": world_t.inv.T.astype(F32),
                    "tm": world_t.m.astype(F32),
                    "mtl": mtl_id,
                    "mesh_slot": 0,
                }
                if node.obj_kind == "mesh":
                    entry["mesh_slot"] = self.add_mesh(node, mtl_id)
                self.groups[node.obj_kind].append(entry)
                self._grow_bounds(node, world_t)
            for child in node.children:
                walk(child, world_t)

        for child in self.desc.root.children:
            walk(child, self.desc.root.transform)

    def _grow_bounds(self, node: NodeDesc, world_t: Transform):
        if node.obj_kind == "sphere":
            lo, hi = np.full(3, -1.0), np.full(3, 1.0)
        elif node.obj_kind == "plane":
            lo, hi = np.array([-1.0, -1.0, 0.0]), np.array([1.0, 1.0, 0.0])
        else:
            lo = node.mesh.v.min(axis=0)
            hi = node.mesh.v.max(axis=0)
        for i in range(8):
            c = np.where([(i >> b) & 1 for b in range(3)], hi, lo)
            w = world_t.transform_from(c)
            self.wmin = np.minimum(self.wmin, w)
            self.wmax = np.maximum(self.wmax, w)

    def add_mesh(self, node: NodeDesc, inst_mtl_id: int) -> int:
        mesh: MeshDesc = node.mesh
        # per-face global material ids: node material wins when bound
        # (the reference only builds a MultiMtl when the node has no
        # explicit material, xmlload.cpp:205,211-241)
        if mesh.materials and node.mtl_name is None:
            key = (id(mesh), -1)
        else:
            key = (id(mesh), inst_mtl_id)
        # instancing: identical geometry+material shares ONE arena slot
        # (the reference reuses loaded objects via objList.Find,
        # xmlload.cpp:203-210)
        cache = getattr(self, "_mesh_slot_cache", None)
        if cache is None:
            cache = self._mesh_slot_cache = {}
        if key in cache:
            return cache[key]
        if mesh.materials and node.mtl_name is None:
            sub_ids = np.array([self.add_material(m) for m in mesh.materials], I32)
            fmtl = sub_ids[np.clip(mesh.face_mtl, 0, len(sub_ids) - 1)]
        else:
            fmtl = np.full(mesh.num_faces, inst_mtl_id, I32)
        self.meshes.append({"mesh": mesh, "face_mtl": fmtl})
        cache[key] = len(self.meshes) - 1
        return cache[key]

    # ---- packing

    def pack_group(self, kind: str) -> InstanceGroup:
        g = self.groups[kind]
        k = len(g)
        if k == 0:
            return InstanceGroup(
                itm=jnp.zeros((0, 3, 3), F32), pos=jnp.zeros((0, 3), F32),
                nrm=jnp.zeros((0, 3, 3), F32), mtl=jnp.zeros(0, I32),
                mesh_slot=jnp.zeros(0, I32),
                tm=jnp.zeros((0, 3, 3), F32))
        return InstanceGroup(
            itm=jnp.asarray(np.stack([e["itm"] for e in g])),
            pos=jnp.asarray(np.stack([e["pos"] for e in g])),
            nrm=jnp.asarray(np.stack([e["nrm"] for e in g])),
            mtl=jnp.asarray(np.array([e["mtl"] for e in g], I32)),
            mesh_slot=jnp.asarray(np.array([e["mesh_slot"] for e in g], I32)),
            tm=jnp.asarray(np.stack([e["tm"] for e in g])),
        )

    def pack_meshes(self) -> Optional[MeshArena]:
        if not self.meshes:
            return None
        tri = {k: [] for k in ("a", "b", "c", "na", "nb", "nc", "ta", "tb", "tc")}
        tri_mtl = []
        b_min, b_max, b_child, b_eoff, b_ecnt, b_elems = [], [], [], [], [], []
        roots = []
        slot_faces = []
        face_base = 0
        node_base = 0
        elem_base = 0
        for rec in self.meshes:
            m: MeshDesc = rec["mesh"]
            f = m.f
            tri["a"].append(m.v[f[:, 0]])
            tri["b"].append(m.v[f[:, 1]])
            tri["c"].append(m.v[f[:, 2]])
            fn = m.fn if m.fn is not None else f
            tri["na"].append(m.vn[fn[:, 0]])
            tri["nb"].append(m.vn[fn[:, 1]])
            tri["nc"].append(m.vn[fn[:, 2]])
            if m.vt is not None and m.ft is not None:
                tri["ta"].append(m.vt[m.ft[:, 0]])
                tri["tb"].append(m.vt[m.ft[:, 1]])
                tri["tc"].append(m.vt[m.ft[:, 2]])
            else:
                z = np.full((len(f), 3), 0.5, F32)
                tri["ta"].append(z)
                tri["tb"].append(z)
                tri["tc"].append(z)
            tri_mtl.append(rec["face_mtl"])

            bvh = build_mesh_bvh(m.v, f, self.bvh_leaf)
            b_min.append(bvh.bmin)
            b_max.append(bvh.bmax)
            child = bvh.child.copy()
            child[child >= 0] += node_base
            b_child.append(child)
            b_eoff.append(bvh.elem_off + elem_base)
            b_ecnt.append(bvh.elem_cnt)
            b_elems.append(bvh.elems + face_base)
            roots.append(node_base + 1)
            slot_faces.append((face_base, face_base + len(f)))
            face_base += len(f)
            node_base += len(bvh.bmin)
            elem_base += len(bvh.elems)

        def cat(parts, dtype=F32):
            return jnp.asarray(np.concatenate(parts).astype(dtype))

        from rtf_tpu.ops.pallas_mesh import pack_triangles
        packed_parts, perm_parts, aabb_parts = [], [], []
        slot_pack = []
        col0 = 0
        arow0 = 0
        for fb, (a, b, c, na, nb, nc, ta, tb, tc, fm) in zip(
                (r[0] for r in slot_faces),
                zip(tri["a"], tri["b"], tri["c"], tri["na"], tri["nb"],
                    tri["nc"], tri["ta"], tri["tb"], tri["tc"], tri_mtl)):
            p, perm, aabb, mb = pack_triangles(
                a, b, c, na, nb, nc, ta, tb, tc, fm)   # [32, F_pad]
            packed_parts.append(p)
            perm_parts.append(perm + fb)   # packed id -> arena face id
            aabb_parts.append(aabb)
            slot_pack.append((col0, p.shape[1], arow0, aabb.shape[0], mb))
            col0 += p.shape[1]
            arow0 += aabb.shape[0]

        na_ = np.concatenate(tri["na"]).astype(F32)
        nb_ = np.concatenate(tri["nb"]).astype(F32)
        nc_ = np.concatenate(tri["nc"]).astype(F32)
        ta_ = np.concatenate(tri["ta"]).astype(F32)
        tb_ = np.concatenate(tri["tb"]).astype(F32)
        tc_ = np.concatenate(tri["tc"]).astype(F32)
        mt_ = np.concatenate(tri_mtl).astype(F32)
        nf_all = len(mt_)
        attr_n = np.zeros((nf_all, 16), F32)
        attr_n[:, 0:3] = na_
        attr_n[:, 3:6] = nb_
        attr_n[:, 6:9] = nc_
        attr_n[:, 9] = mt_
        attr_t = np.zeros((nf_all, 16), F32)
        attr_t[:, 0:3] = ta_
        attr_t[:, 3:6] = tb_
        attr_t[:, 6:9] = tc_
        # col 9: per-face isotropic uv density sqrt(area_uv/area_local)
        # — converts a local-space footprint length into a uv-space
        # footprint for ray-differential texture filtering (the analog
        # of TriObj::calculateduvw, RayTracingProj7 objects.h:152-158)
        a_ = np.concatenate(tri["a"]).astype(F32)
        bv_ = np.concatenate(tri["b"]).astype(F32)
        c_ = np.concatenate(tri["c"]).astype(F32)
        area_w = 0.5 * np.linalg.norm(
            np.cross(bv_ - a_, c_ - a_), axis=1)
        t1 = (tb_ - ta_)[:, :2]
        t2 = (tc_ - ta_)[:, :2]
        area_uv = 0.5 * np.abs(t1[:, 0] * t2[:, 1] - t1[:, 1] * t2[:, 0])
        attr_t[:, 9] = np.sqrt(area_uv / np.maximum(area_w, 1e-20))

        return MeshArena(
            tri_a=cat(tri["a"]), tri_b=cat(tri["b"]), tri_c=cat(tri["c"]),
            tri_na=cat(tri["na"]), tri_nb=cat(tri["nb"]), tri_nc=cat(tri["nc"]),
            tri_ta=cat(tri["ta"]), tri_tb=cat(tri["tb"]), tri_tc=cat(tri["tc"]),
            tri_mtl=cat(tri_mtl, I32),
            bvh_min=cat(b_min), bvh_max=cat(b_max),
            bvh_child=cat(b_child, I32), bvh_eoff=cat(b_eoff, I32),
            bvh_ecnt=cat(b_ecnt, I32), bvh_elems=cat(b_elems, I32),
            slot_root=jnp.asarray(np.array(roots, I32)),
            max_leaf=self.bvh_leaf,
            slot_faces=tuple(slot_faces),
            tri_packed=jnp.asarray(np.concatenate(packed_parts, axis=1)),
            tri_perm=jnp.asarray(np.concatenate(perm_parts)),
            attr_n=jnp.asarray(attr_n), attr_t=jnp.asarray(attr_t),
            tile_aabb=jnp.asarray(np.concatenate(aabb_parts, axis=0)),
            slot_pack=tuple(slot_pack),
        )

    def pack_materials(self) -> MaterialTable:
        ms = self.materials or [MaterialDesc(name="__default__")]

        def chan(get_tc):
            cols = np.stack([np.asarray(get_tc(m).color, F32) for m in ms])
            tms = np.array([self.add_texmap(get_tc(m)) for m in ms], I32)
            return jnp.asarray(cols), jnp.asarray(tms)

        dif, dif_tm = chan(lambda m: m.diffuse)
        spec, spec_tm = chan(lambda m: m.specular)
        emi, emi_tm = chan(lambda m: m.emission)
        refl, refl_tm = chan(lambda m: m.reflection)
        refr, refr_tm = chan(lambda m: m.refraction)
        return MaterialTable(
            diffuse=dif, diffuse_tm=dif_tm,
            specular=spec, specular_tm=spec_tm,
            emission=emi, emission_tm=emi_tm,
            reflection=refl, reflection_tm=refl_tm,
            refraction=refr, refraction_tm=refr_tm,
            glossiness=jnp.asarray(np.array([m.glossiness for m in ms], F32)),
            refl_gloss=jnp.asarray(np.array([m.reflection_glossiness for m in ms], F32)),
            refr_gloss=jnp.asarray(np.array([m.refraction_glossiness for m in ms], F32)),
            ior=jnp.asarray(np.array([m.ior for m in ms], F32)),
            absorption=jnp.asarray(np.stack([np.asarray(m.absorption, F32) for m in ms])),
        )

    def pack_lights(self) -> LightTable:
        ls = self.desc.lights
        L = len(ls)
        kind_map = {"ambient": LIGHT_AMBIENT, "direct": LIGHT_DIRECT, "point": LIGHT_POINT}
        return LightTable(
            kind=jnp.asarray(np.array([kind_map[l.kind] for l in ls], I32).reshape(L)),
            intensity=jnp.asarray(np.stack([np.asarray(l.intensity, F32) for l in ls]) if L else np.zeros((0, 3), F32)),
            direction=jnp.asarray(np.stack([np.asarray(l.direction, F32) for l in ls]) if L else np.zeros((0, 3), F32)),
            position=jnp.asarray(np.stack([np.asarray(l.position, F32) for l in ls]) if L else np.zeros((0, 3), F32)),
            size=jnp.asarray(np.array([l.size for l in ls], F32).reshape(L)),
        )

    def pack_textures(self):
        X = len(self.textures)
        kinds = np.zeros(max(X, 1), I32)
        widths = np.ones(max(X, 1), I32)
        heights = np.ones(max(X, 1), I32)
        row0 = np.zeros(max(X, 1), I32)
        c1 = np.zeros((max(X, 1), 3), F32)
        c2 = np.zeros((max(X, 1), 3), F32)
        slices = []
        rows = 0
        maxw = 1
        for i, t in enumerate(self.textures):
            if t.kind == "file" and t.data is not None:
                kinds[i] = TEX_FILE
                h, w = t.data.shape[:2]
                widths[i], heights[i] = w, h
                row0[i] = rows
                rows += h
                maxw = max(maxw, w)
                slices.append(t.data)
            else:
                kinds[i] = TEX_CHECKER
                c1[i] = np.asarray(t.color1, F32)
                c2[i] = np.asarray(t.color2, F32)
        atlas = np.zeros((max(rows, 1), maxw, 3), F32)
        r = 0
        for s in slices:
            h, w = s.shape[:2]
            atlas[r : r + h, :w] = s
            r += h
        tex_table = TextureTable(
            atlas=jnp.asarray(atlas), kind=jnp.asarray(kinds),
            width=jnp.asarray(widths), height=jnp.asarray(heights),
            row0=jnp.asarray(row0), c1=jnp.asarray(c1), c2=jnp.asarray(c2))
        T = len(self.texmaps)
        if T == 0:
            tmap = TexMapTable(tex=jnp.zeros(1, I32),
                               itm=jnp.eye(3, dtype=F32)[None],
                               pos=jnp.zeros((1, 3), F32))
        else:
            tmap = TexMapTable(
                tex=jnp.asarray(np.array([t for t, _ in self.texmaps], I32)),
                itm=jnp.asarray(np.stack([tr.inv for _, tr in self.texmaps]).astype(F32)),
                pos=jnp.asarray(np.stack([tr.pos for _, tr in self.texmaps]).astype(F32)),
            )
        return tex_table, tmap


def camera_basis(cam) -> np.ndarray:
    """Camera->world basis with columns (x_new, up, z_new): the matrix the
    reference builds in RenderPixel (Final/main.cpp:219-224)."""
    z_new = -np.asarray(cam.dir, np.float64)
    x_new = np.cross(np.asarray(cam.up, np.float64), z_new)
    z_new /= np.linalg.norm(z_new)
    x_new /= np.linalg.norm(x_new)
    up = np.asarray(cam.up, np.float64)
    up = up / np.linalg.norm(up)
    return np.stack([x_new, up, z_new], axis=1).astype(F32)


def build_scene(desc: SceneDesc, bvh_leaf: int = 8) -> GpuScene:
    b = _Builder(desc, bvh_leaf=bvh_leaf)
    b.flatten()
    materials = b.pack_materials()
    bg_tm = b.add_texmap(desc.background)
    env_tm = b.add_texmap(desc.environment)
    textures, texmaps = b.pack_textures()
    mesh = b.pack_meshes()
    cam = desc.camera
    return GpuScene(
        spheres=b.pack_group("sphere"),
        planes=b.pack_group("plane"),
        mesh_inst=b.pack_group("mesh"),
        mesh=mesh,
        materials=materials,
        lights=b.pack_lights(),
        textures=textures,
        texmaps=texmaps,
        bg_color=jnp.asarray(np.asarray(desc.background.color, F32)),
        env_color=jnp.asarray(np.asarray(desc.environment.color, F32)),
        cam_pos=jnp.asarray(np.asarray(cam.pos, F32)),
        cam_m=jnp.asarray(camera_basis(cam)),
        bg_tm=bg_tm, env_tm=env_tm,
        fov=float(cam.fov), focaldist=float(cam.focaldist), dof=float(cam.dof),
        width=int(cam.width), height=int(cam.height),
        num_spheres=len(b.groups["sphere"]),
        num_planes=len(b.groups["plane"]),
        num_mesh_inst=len(b.groups["mesh"]),
        num_lights=len(desc.lights),
        world_min=tuple(float(x) for x in (b.wmin if np.isfinite(b.wmin).all() else np.full(3, -1.0))),
        world_max=tuple(float(x) for x in (b.wmax if np.isfinite(b.wmax).all() else np.full(3, 1.0))),
        light_kinds=tuple(l.kind for l in desc.lights),
        any_soft_light=any(l.kind == "point" and l.size > 0 for l in desc.lights),
        mesh_inst_slots=tuple(int(e["mesh_slot"]) for e in b.groups["mesh"]),
        has_file_tex=any(t.kind == "file" and t.data is not None
                         for t in b.textures),
        any_glossy=bool(
            float(np.asarray(materials.refl_gloss).max(initial=0.0)) > 0
            or float(np.asarray(materials.refr_gloss).max(initial=0.0)) > 0),
        tm_channels=tuple(
            ch for ch, tm in (("diffuse", materials.diffuse_tm),
                              ("specular", materials.specular_tm))
            if int(np.asarray(tm).max(initial=-1)) >= 0),
    )
