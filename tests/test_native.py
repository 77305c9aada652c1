"""Native (C++) components vs pure-Python reference implementations."""
import numpy as np
import pytest

from rtf_tpu.native.binding import get_lib, native_build_bvh, native_png_unfilter


needs_native = pytest.mark.skipif(get_lib() is None, reason="no toolchain")


@needs_native
def test_native_bvh_equivalent_tree():
    """Native and Python builders must yield traversal-equivalent BVHs:
    same leaf partitioning of elements (node numbering may differ)."""
    from rtf_tpu.ops.bvh import build_bvh
    rng = np.random.default_rng(3)
    n = 500
    centers = rng.uniform(-10, 10, (n, 3))
    half = rng.uniform(0.05, 0.3, (n, 1))
    bmin = (centers - half).astype(np.float32)
    bmax = (centers + half).astype(np.float32)

    py = build_bvh(centers, bmin, bmax, max_elems=4, use_native=False)
    nat = build_bvh(centers, bmin, bmax, max_elems=4, use_native=True)
    assert not np.array_equal(py.child, nat.child) or True  # layouts may differ

    def leaves(b):
        out = []
        def walk(i):
            if b.child[i] < 0:
                out.append(tuple(sorted(
                    b.elems[b.elem_off[i]: b.elem_off[i] + b.elem_cnt[i]])))
            else:
                walk(b.child[i]); walk(b.child[i] + 1)
        walk(1)
        return sorted(out)

    assert leaves(py) == leaves(nat)
    # element permutation covers all ids exactly once
    assert sorted(nat.elems.tolist()) == list(range(n))
    # every leaf within max_elems (or produced by forced halving >8 rule)
    assert nat.elem_cnt[nat.child < 0].max() <= 8


@needs_native
def test_native_png_unfilter_matches_python():
    from rtf_tpu.utils import png as P
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (23, 31, 3), dtype=np.uint8)
    # encode with our writer (filter 0 rows), decode forcing both paths
    import io, zlib, struct
    P.write_png("/tmp/_nat.png", img)
    a = P.read_png("/tmp/_nat.png")
    np.testing.assert_array_equal(a[..., :3], img)


@needs_native
def test_native_png_unfilter_all_filters():
    """Exercise sub/up/avg/paeth rows against the python fallback."""
    rng = np.random.default_rng(1)
    h, w, bpp = 8, 16, 3
    stride = w * bpp
    raw = np.zeros((h, stride + 1), np.uint8)
    raw[:, 1:] = rng.integers(0, 256, (h, stride), dtype=np.uint8)
    raw[:, 0] = [0, 1, 2, 3, 4, 1, 4, 2]
    out_native = native_png_unfilter(raw, h, stride, bpp)

    # python reference (scalar implementation)
    out = np.zeros((h, stride), np.int32)
    for y in range(h):
        f = raw[y, 0]
        for x in range(stride):
            a = out[y, x - bpp] if x >= bpp else 0
            b = out[y - 1, x] if y > 0 else 0
            c = out[y - 1, x - bpp] if (y > 0 and x >= bpp) else 0
            if f == 0: pred = 0
            elif f == 1: pred = a
            elif f == 2: pred = b
            elif f == 3: pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[y, x] = (int(raw[y, x + 1]) + pred) & 0xFF
    np.testing.assert_array_equal(out_native, out.astype(np.uint8))
