"""BVH: host-side builder + device-side batched traversal.

Builder reproduces cy::BVH semantics (cyBVH.h:122-142,242-328): binary
tree over element AABBs, widest-axis mean split with fallback to the next
axes then an arbitrary halving, <= max_elems per leaf, children stored
adjacently (child2 = child1 + 1), root at index 1 (index 0 unused).

The device traversal replaces the recursive TraceBVHNode walk
(objects.h:271-302) with a batched, fixed-depth stack loop: every ray in
the wavefront carries its own small stack in registers/VMEM and the whole
batch advances in lock step under `lax.while_loop` — the TPU analogue of
SIMT while-while traversal.  If a C++ builder is available
(rtf_tpu/native), it is used for large meshes; the NumPy path is the
reference implementation.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BvhArrays(NamedTuple):
    """Flattened BVH. Node 0 is a dummy; root is node 1 (cyBVH.h:76)."""
    bmin: np.ndarray      # [N,3] float32
    bmax: np.ndarray      # [N,3] float32
    child: np.ndarray     # [N] int32: first child id, or -1 for leaf
    elem_off: np.ndarray  # [N] int32: offset into elems (leaves)
    elem_cnt: np.ndarray  # [N] int32: element count (leaves)
    elems: np.ndarray     # [E] int32: element (face) ids, leaf-contiguous


def build_bvh(centers: np.ndarray, boxes_min: np.ndarray, boxes_max: np.ndarray,
              max_elems: int = 8, use_native: bool = True) -> BvhArrays:
    """Build over element bounds; `centers` are the split keys
    (GetElementCenter).  Uses the C++ builder (rtf_tpu/native) when
    available; the NumPy path below is the reference implementation."""
    n = len(centers)
    if use_native and n > 0:
        try:
            from rtf_tpu.native.binding import native_build_bvh
            out = native_build_bvh(centers, boxes_min, boxes_max, max_elems)
        except Exception:
            out = None
        if out is not None:
            nm, nx, child, eoff, ecnt, elems = out
            return BvhArrays(nm, nx, child, eoff, ecnt, elems)
    elems = np.arange(n, dtype=np.int32)
    if n == 0:
        z3 = np.zeros((2, 3), np.float32)
        return BvhArrays(z3, z3, np.full(2, -1, np.int32),
                         np.zeros(2, np.int32), np.zeros(2, np.int32),
                         np.zeros(0, np.int32))

    # temp tree as dict nodes, then flatten in cyBVH's ConvertTempData order
    nodes = []  # (bmin, bmax, child1_tmp, elem_off, elem_cnt)

    def node_bounds(e):
        return boxes_min[e].min(axis=0), boxes_max[e].max(axis=0)

    def find_split(e, bmin, bmax):
        """MeanSplit (cyBVH.h:295-328): widest axis first, then the others."""
        cnt = len(e)
        if cnt <= max_elems:
            return 0
        d = bmax - bmin
        order = [int(np.argmax(d))]
        rest = [a for a in range(3) if a != order[0]]
        if d[rest[0]] < d[rest[1]]:
            rest = [rest[1], rest[0]]
        order += rest
        for axis in order:
            split_pos = 0.5 * (bmin[axis] + bmax[axis])
            left = centers[e][:, axis] <= split_pos
            i = int(left.sum())
            if 0 < i < cnt:
                # stable partition (order within halves doesn't matter for
                # correctness; cy uses an in-place swap partition)
                e[:] = np.concatenate([e[left], e[~left]])
                return i
        return 0

    class Tmp:
        __slots__ = ("off", "cnt", "bmin", "bmax", "c1", "c2")

        def __init__(self, off, cnt, bmin, bmax):
            self.off, self.cnt = off, cnt
            self.bmin, self.bmax = bmin, bmax
            self.c1 = self.c2 = None

    def split(t: Tmp):
        e = elems[t.off : t.off + t.cnt]
        i = find_split(e, t.bmin, t.bmax)
        if i == 0 or i >= t.cnt:
            if t.cnt > 8:         # CY_BVH_MAX_ELEMENT_COUNT fallback halving
                i = t.cnt // 2
            else:
                return
        l_min, l_max = node_bounds(e[:i])
        r_min, r_max = node_bounds(e[i:])
        t.c1 = Tmp(t.off, i, l_min, l_max)
        t.c2 = Tmp(t.off + i, t.cnt - i, r_min, r_max)
        split(t.c1)
        split(t.c2)

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        bmin, bmax = node_bounds(elems)
        root = Tmp(0, n, bmin, bmax)
        split(root)

        def count(t):
            return 1 if t.c1 is None else 1 + count(t.c1) + count(t.c2)

        num_nodes = count(root)
        N = num_nodes + 1
        a_bmin = np.zeros((N, 3), np.float32)
        a_bmax = np.zeros((N, 3), np.float32)
        a_child = np.full(N, -1, np.int32)
        a_eoff = np.zeros(N, np.int32)
        a_ecnt = np.zeros(N, np.int32)

        def convert(node_id, t, child_index):
            """ConvertTempData (cyBVH.h:242-258): DFS with adjacent children."""
            a_bmin[node_id] = t.bmin
            a_bmax[node_id] = t.bmax
            if t.c1 is None:
                a_eoff[node_id] = t.off
                a_ecnt[node_id] = t.cnt
                return child_index
            a_child[node_id] = child_index
            new_ci = convert(child_index, t.c1, child_index + 2)
            return convert(child_index + 1, t.c2, new_ci)

        convert(1, root, 2)
    finally:
        sys.setrecursionlimit(old_limit)

    return BvhArrays(a_bmin, a_bmax, a_child, a_eoff, a_ecnt, elems.copy())


def build_mesh_bvh(verts: np.ndarray, faces: np.ndarray, max_elems: int = 8) -> BvhArrays:
    """BVH over triangles: element bounds = per-face AABBs, centers = AABB
    centers (cyBVHTriMesh::GetElementBounds/Center, cyBVH.h:339-379)."""
    tri = verts[faces]                      # [F,3,3]
    bmin = tri.min(axis=1)
    bmax = tri.max(axis=1)
    centers = 0.5 * (bmin + bmax)
    return build_bvh(centers.astype(np.float64), bmin, bmax, max_elems)
