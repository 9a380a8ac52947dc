"""ctypes binding for the native segmentator (+ numpy reference fallback).

Public API mirrors the reference wrapper
(/root/reference/lib/segmentator/main.py:7-36): returns compacted segment ids
0..S-1 via unique(return_inverse).

The shared library is built on demand with g++ (no pybind11/torch needed).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsegmentator.so")
_SRC = os.path.join(_DIR, "segmentator.cc")
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.segment_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.segment_point.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def _compact(ids: np.ndarray) -> np.ndarray:
    _, inverse = np.unique(ids, return_inverse=True)
    return inverse.astype(np.int64)


def segment_mesh(vertices: np.ndarray, faces: np.ndarray,
                 k_thresh: float = 0.01, seg_min_verts: int = 20) -> np.ndarray:
    """Superpoints for a triangle mesh -> (V,) int64 compacted segment ids."""
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.zeros(v.shape[0], np.int32)
    lib = _get_lib()
    lib.segment_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), f.shape[0],
        ctypes.c_float(k_thresh), seg_min_verts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return _compact(out)


def segment_point(points: np.ndarray, normals: np.ndarray, edges: np.ndarray,
                  k_thresh: float = 0.01, seg_min_verts: int = 20) -> np.ndarray:
    """Superpoints for an arbitrary point graph -> (N,) int64 segment ids."""
    p = np.ascontiguousarray(points, np.float32)
    n = np.ascontiguousarray(normals, np.float32)
    e = np.ascontiguousarray(edges, np.int64)
    out = np.zeros(p.shape[0], np.int32)
    lib = _get_lib()
    lib.segment_point(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), p.shape[0],
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), e.shape[0],
        ctypes.c_float(k_thresh), seg_min_verts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return _compact(out)


# ------------------------------------------------------------------
# Pure-numpy reference (test oracle; same algorithm, python union-find)
# ------------------------------------------------------------------


def segment_mesh_np(vertices: np.ndarray, faces: np.ndarray,
                    k_thresh: float = 0.01, seg_min_verts: int = 20) -> np.ndarray:
    v = vertices.astype(np.float32)
    f = faces.astype(np.int64)
    nv = v.shape[0]
    points = np.zeros((nv, 3), np.float32)
    normals = np.zeros((nv, 3), np.float32)
    counts = np.zeros(nv, np.int64)
    edges = []
    for i in range(f.shape[0]):
        i1, i2, i3 = f[i]
        p1, p2, p3 = v[i1], v[i2], v[i3]
        points[i1], points[i2], points[i3] = p1, p2, p3
        edges += [(i1, i2), (i1, i3), (i3, i2)]
        fn = np.cross(p2 - p1, p3 - p1)
        fn = fn / np.linalg.norm(fn)
        for vi in (i1, i2, i3):
            t = 1.0 / (counts[vi] + 1.0)
            normals[vi] = t * fn + (1.0 - t) * normals[vi]
            counts[vi] += 1
    ws = []
    for a, b in edges:
        d = points[b] - points[a]
        d = d / np.linalg.norm(d)
        dot = float(np.dot(normals[a], normals[b]))
        dot2 = float(np.dot(normals[b], d))
        w = 1.0 - dot
        if dot2 > 0:
            w = w * w
        ws.append(np.float32(w))

    parent = list(range(nv))
    size = [1] * nv
    rank = [0] * nv

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    def join(a, b):
        if rank[a] > rank[b]:
            parent[b] = a
            size[a] += size[b]
        else:
            parent[a] = b
            size[b] += size[a]
            if rank[a] == rank[b]:
                rank[b] += 1

    order = np.argsort(np.array(ws), kind="stable")
    thr = [k_thresh] * nv
    for ei in order:
        a, b = edges[ei]
        ra, rb = find(a), find(b)
        if ra != rb and ws[ei] <= thr[ra] and ws[ei] <= thr[rb]:
            join(ra, rb)
            r = find(ra)
            thr[r] = float(ws[ei]) + k_thresh / size[r]
    for ei in order:
        a, b = edges[ei]
        ra, rb = find(a), find(b)
        if ra != rb and (size[ra] < seg_min_verts or size[rb] < seg_min_verts):
            join(ra, rb)
    return _compact(np.array([find(q) for q in range(nv)]))
