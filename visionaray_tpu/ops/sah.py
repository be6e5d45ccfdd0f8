"""Host-side binned-SAH builder (native C++ via ctypes).

The quality-builder alternative to the on-device LBVH: re-implements the
reference's binned-SAH algorithm (detail/bvh/sah.h:150-763: 16 bins,
centroid-axis pick, sweep cost) in C++ (native/sah_builder.cpp), emitting
the same flat BVH pytree as ops/lbvh.py so traversal is agnostic to the
builder.  Used when tree quality matters more than build latency (static
scenes); `build()` dispatches like the reference's build<BVH>() entry
(detail/bvh/build.inl:165).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.ops.lbvh import BVH, triangle_aabbs

_LIB = None
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "sah_builder.cpp")
_SO = os.path.join(_REPO, "native", "libsah_builder.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True)
    lib = ctypes.CDLL(_SO)
    lib.vsnray_tpu_build_sah.restype = ctypes.c_int
    lib.vsnray_tpu_build_sah.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.vsnray_tpu_build_sbvh.restype = ctypes.c_int
    lib.vsnray_tpu_build_sbvh.argtypes = [
        fp, fp, fp, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, fp, fp, ip, ip, ip, ip, ip, ip, ip,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build_sah_from_aabbs(prim_lo, prim_hi) -> BVH:
    lib = _load()
    lo = np.ascontiguousarray(np.asarray(prim_lo, np.float32))
    hi = np.ascontiguousarray(np.asarray(prim_hi, np.float32))
    n = lo.shape[0]
    node_lo = np.empty((2 * n - 1, 3), np.float32)
    node_hi = np.empty((2 * n - 1, 3), np.float32)
    left = np.empty((max(n - 1, 1),), np.int32)
    right = np.empty((max(n - 1, 1),), np.int32)
    parent = np.empty((2 * n - 1,), np.int32)
    prim_ids = np.empty((n,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.vsnray_tpu_build_sah(
        lo.ctypes.data_as(fp), hi.ctypes.data_as(fp), n,
        node_lo.ctypes.data_as(fp), node_hi.ctypes.data_as(fp),
        left.ctypes.data_as(ip), right.ctypes.data_as(ip),
        parent.ctypes.data_as(ip), prim_ids.ctypes.data_as(ip))
    assert rc == 0, f"SAH builder failed: {rc}"
    if n == 1:
        left = left[:0]
        right = right[:0]
    return BVH(node_lo=jnp.asarray(node_lo), node_hi=jnp.asarray(node_hi),
               left=jnp.asarray(left[: n - 1]),
               right=jnp.asarray(right[: n - 1]),
               parent=jnp.asarray(parent), prim_ids=jnp.asarray(prim_ids))


def build_sah(mesh) -> BVH:
    """Build a SAH BVH over a TriangleMesh (host-side, numpy in/out)."""
    v1, e1, e2 = mesh.corners()
    lo, hi = triangle_aabbs(v1, e1, e2)
    return build_sah_from_aabbs(np.asarray(lo), np.asarray(hi))


def build_sbvh(mesh, alpha: float = 1e-5, max_leaf_size: int = 4) -> BVH:
    """Full-quality SBVH: binned SAH + spatial splits + multi-prim leaves.

    The analogue of the reference's binned_sah_builder with
    use_spatial_splits=true (detail/bvh/sah.h:430-615; gate
    alpha*SA(root), sah.h:651) and max_leaf_size=4 (build.inl:139).
    Triangles straddling a chosen spatial plane are clipped and referenced
    from both children, so ``prim_ids`` may repeat ids and is longer than
    the leaf count.  Returns a generalized-leaf BVH (lbvh.BVH docstring).
    """
    lib = _load()
    v1, e1, e2 = (np.ascontiguousarray(np.asarray(a, np.float32))
                  for a in mesh.corners())
    n = v1.shape[0]
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    cap_leaves, cap_refs = max(2 * n, 8), max(2 * n, 8)
    for _ in range(3):
        node_lo = np.empty((2 * cap_leaves - 1, 3), np.float32)
        node_hi = np.empty((2 * cap_leaves - 1, 3), np.float32)
        left = np.empty((max(cap_leaves - 1, 1),), np.int32)
        right = np.empty((max(cap_leaves - 1, 1),), np.int32)
        parent = np.empty((2 * cap_leaves - 1,), np.int32)
        leaf_first = np.empty((cap_leaves,), np.int32)
        leaf_count = np.empty((cap_leaves,), np.int32)
        prim_refs = np.empty((cap_refs,), np.int32)
        counts = np.zeros((2,), np.int32)
        rc = lib.vsnray_tpu_build_sbvh(
            v1.ctypes.data_as(fp), e1.ctypes.data_as(fp),
            e2.ctypes.data_as(fp), n, ctypes.c_float(alpha),
            max_leaf_size, cap_leaves, cap_refs,
            node_lo.ctypes.data_as(fp), node_hi.ctypes.data_as(fp),
            left.ctypes.data_as(ip), right.ctypes.data_as(ip),
            parent.ctypes.data_as(ip), leaf_first.ctypes.data_as(ip),
            leaf_count.ctypes.data_as(ip), prim_refs.ctypes.data_as(ip),
            counts.ctypes.data_as(ip))
        if rc == 0:
            break
        assert rc == 1, f"SBVH builder failed: {rc}"
        cap_leaves = int(counts[0]) + 8
        cap_refs = int(counts[1]) + 8
    else:
        raise RuntimeError("SBVH capacity retry loop did not converge")
    L, R = int(counts[0]), int(counts[1])
    return BVH(
        node_lo=jnp.asarray(node_lo[: 2 * L - 1]),
        node_hi=jnp.asarray(node_hi[: 2 * L - 1]),
        left=jnp.asarray(left[: max(L - 1, 0)]),
        right=jnp.asarray(right[: max(L - 1, 0)]),
        parent=jnp.asarray(parent[: 2 * L - 1]),
        prim_ids=jnp.asarray(prim_refs[:R]),
        leaf_first=jnp.asarray(leaf_first[:L]),
        leaf_count=jnp.asarray(leaf_count[:L]),
        max_leaf_size=int(max_leaf_size),
    )


def build(mesh, builder: str = "lbvh"):
    """Builder dispatch (the build<bvh>() entry, build.inl:165-178):
    'lbvh' (on-device), 'sah' (host, native), or 'sbvh' (host, native,
    spatial splits + multi-prim leaves)."""
    if builder == "sah":
        return build_sah(mesh)
    if builder == "sbvh":
        return build_sbvh(mesh)
    from visionaray_tpu.ops.lbvh import build_lbvh
    return build_lbvh(mesh)
