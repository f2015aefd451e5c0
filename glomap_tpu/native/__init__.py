"""Native C++ host-side helpers, loaded via ctypes with NumPy fallbacks.

Counterpart of the reference's native runtime pieces that stay host-side
in the TPU design (SURVEY.md §2.2): colmap::UnionFind track concatenation
and connected components. Built on demand with g++ (no pybind11 in this
image); every entry point has a pure-NumPy fallback so the framework works
even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libglomap_native.so")
_SRC = os.path.join(_DIR, "track_engine.cpp")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO) or
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.glomap_establish_tracks.restype = ctypes.c_int64
        lib.glomap_establish_tracks.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.glomap_establish_tracks_consistent.restype = ctypes.c_int64
        lib.glomap_establish_tracks_consistent.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.POINTER(ctypes.c_int64)]
        lib.glomap_select_tracks.restype = ctypes.c_int64
        lib.glomap_select_tracks.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.glomap_connected_components.restype = ctypes.c_int64
        lib.glomap_connected_components.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


# ----------------------------------------------------------------------------
# union-find track concatenation
# ----------------------------------------------------------------------------


def establish_tracks(num_kp: int, kp1: np.ndarray, kp2: np.ndarray):
    """Union keypoints joined by matches; returns (track_id per kp, count).

    track_id is -1 for keypoints in no match. Native path when available.
    """
    kp1 = np.ascontiguousarray(kp1, dtype=np.int64)
    kp2 = np.ascontiguousarray(kp2, dtype=np.int64)
    lib = get_lib()
    if lib:
        out = np.empty(num_kp, dtype=np.int64)
        n = lib.glomap_establish_tracks(
            num_kp, len(kp1), _ptr(kp1, ctypes.c_int64),
            _ptr(kp2, ctypes.c_int64), _ptr(out, ctypes.c_int64))
        return out, int(n)
    return _establish_tracks_numpy(num_kp, kp1, kp2)


def establish_tracks_consistent(num_kp: int, kp1: np.ndarray,
                                kp2: np.ndarray, kp_image: np.ndarray,
                                kp_xy: np.ndarray, thres: float):
    """Consistency-aware union-find: a union is refused when the merged
    component would hold two features of one image further apart than
    `thres` (per-image bounding-box diagonal) — the joining match is a
    bridge between different physical points. Keeps every true track
    alive in the percolation regime where the reference's
    union-then-discard collapses (see track_engine.cpp). Returns
    (track_id per kp [-1 = none], count)."""
    kp1 = np.ascontiguousarray(kp1, dtype=np.int64)
    kp2 = np.ascontiguousarray(kp2, dtype=np.int64)
    kp_image = np.ascontiguousarray(kp_image, dtype=np.int64)
    kp_xy = np.ascontiguousarray(kp_xy, dtype=np.float64)
    lib = get_lib()
    if lib:
        out = np.empty(num_kp, dtype=np.int64)
        n = lib.glomap_establish_tracks_consistent(
            num_kp, len(kp1), _ptr(kp1, ctypes.c_int64),
            _ptr(kp2, ctypes.c_int64), _ptr(kp_image, ctypes.c_int64),
            _ptr(kp_xy, ctypes.c_double), float(thres),
            _ptr(out, ctypes.c_int64))
        return out, int(n)
    return _establish_tracks_consistent_python(num_kp, kp1, kp2, kp_image,
                                               kp_xy, thres)


def _establish_tracks_consistent_python(num_kp, kp1, kp2, kp_image, kp_xy,
                                        thres):
    """Sequential fallback (same semantics as the native path; fine for
    test-scale inputs — the .so handles production match counts)."""
    parent = np.arange(num_kp, dtype=np.int64)
    maps = [None] * num_kp
    t2 = float(thres) * float(thres)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def get_map(r):
        if maps[r] is None:
            x, y = kp_xy[r]
            maps[r] = {int(kp_image[r]): [x, x, y, y]}
        return maps[r]

    for a0, b0 in zip(kp1, kp2):
        a, b = find(a0), find(b0)
        if a == b:
            continue
        ma, mb = get_map(a), get_map(b)
        if len(mb) > len(ma):
            a, b, ma, mb = b, a, mb, ma
        ok = True
        for img, bx in mb.items():
            o = ma.get(img)
            if o is None:
                continue
            dx = max(o[1], bx[1]) - min(o[0], bx[0])
            dy = max(o[3], bx[3]) - min(o[2], bx[2])
            if dx * dx + dy * dy > t2:
                ok = False
                break
        if not ok:
            continue
        for img, bx in mb.items():
            o = ma.get(img)
            if o is None:
                ma[img] = bx
            else:
                o[0] = min(o[0], bx[0])
                o[1] = max(o[1], bx[1])
                o[2] = min(o[2], bx[2])
                o[3] = max(o[3], bx[3])
        maps[b] = None
        parent[b] = a

    roots = np.asarray([find(i) for i in range(num_kp)], dtype=np.int64)
    sizes = np.bincount(roots, minlength=num_kp)
    is_track_root = (np.arange(num_kp) == roots) & (sizes >= 2)
    remap = np.full(num_kp, -1, dtype=np.int64)
    remap[is_track_root] = np.arange(int(is_track_root.sum()))
    return remap[roots], int(is_track_root.sum())


def _establish_tracks_numpy(num_kp, kp1, kp2):
    """Pointer-jumping label propagation (vectorized union-find)."""
    label = np.arange(num_kp, dtype=np.int64)
    # iterate: each edge pulls both endpoints to the min label, then
    # compress by pointer jumping; converges in O(log n) sweeps
    for _ in range(64):
        l1 = label[kp1]
        l2 = label[kp2]
        m = np.minimum(l1, l2)
        changed = False
        if np.any(l1 != m):
            np.minimum.at(label, kp1, m)
            changed = True
        if np.any(l2 != m):
            np.minimum.at(label, kp2, m)
            changed = True
        # pointer jumping until idempotent
        for _ in range(64):
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if not changed:
            break
    touched = np.zeros(num_kp, dtype=bool)
    touched[kp1] = True
    touched[kp2] = True
    roots = label[touched]
    uniq = np.unique(roots)
    remap = np.full(num_kp, -1, dtype=np.int64)
    remap[uniq] = np.arange(len(uniq))
    out = np.where(touched, remap[label], -1)
    return out, len(uniq)


# ----------------------------------------------------------------------------
# greedy coverage selection
# ----------------------------------------------------------------------------


def select_tracks(num_tracks: int, obs_track: np.ndarray,
                  obs_image: np.ndarray, track_eligible: np.ndarray,
                  track_num_images: np.ndarray, num_images: int,
                  min_tracks_per_view: int, max_num_tracks: int):
    """Greedy longest-first coverage selection; returns bool mask per track.

    Reference semantics (track_establishment.cc FindTracksForProblem),
    including min_tracks_per_view < 0 meaning "select all eligible".
    """
    obs_track = np.ascontiguousarray(obs_track, dtype=np.int64)
    obs_image = np.ascontiguousarray(obs_image, dtype=np.int64)
    track_eligible = np.ascontiguousarray(track_eligible, dtype=np.uint8)
    track_num_images = np.ascontiguousarray(track_num_images, dtype=np.int64)
    lib = get_lib()
    if lib:
        sel = np.zeros(num_tracks, dtype=np.uint8)
        lib.glomap_select_tracks(
            num_tracks, len(obs_track), _ptr(obs_track, ctypes.c_int64),
            _ptr(obs_image, ctypes.c_int64),
            _ptr(track_eligible, ctypes.c_uint8),
            _ptr(track_num_images, ctypes.c_int64),
            num_images, min_tracks_per_view, max_num_tracks,
            _ptr(sel, ctypes.c_uint8))
        return sel.astype(bool)
    return _select_tracks_python(num_tracks, obs_track, obs_image,
                                 track_eligible, track_num_images,
                                 num_images, min_tracks_per_view,
                                 max_num_tracks)


def _select_tracks_python(num_tracks, obs_track, obs_image, track_eligible,
                          track_num_images, num_images, min_tracks_per_view,
                          max_num_tracks):
    order = np.lexsort((-np.arange(num_tracks), -track_num_images))
    # CSR bucketing
    sort_idx = np.argsort(obs_track, kind="stable")
    st = obs_track[sort_idx]
    offsets = np.searchsorted(st, np.arange(num_tracks + 1))
    per_image = np.zeros(num_images, dtype=np.int64)
    images_left = num_images
    selected = np.zeros(num_tracks, dtype=bool)
    n_sel = 0
    for t in order:
        if not track_eligible[t]:
            continue
        added = False
        for p in range(offsets[t], offsets[t + 1]):
            img = obs_image[sort_idx[p]]
            if min_tracks_per_view >= 0 and \
                    per_image[img] > min_tracks_per_view:
                continue
            per_image[img] += 1
            if min_tracks_per_view >= 0 and \
                    per_image[img] > min_tracks_per_view:
                images_left -= 1
            if not added:
                selected[t] = True
                added = True
                n_sel += 1
        if min_tracks_per_view >= 0 and images_left <= 0:
            break
        if n_sel > max_num_tracks:
            break
    return selected


def connected_components(num_nodes: int, ei: np.ndarray, ej: np.ndarray):
    """Component label per node (native union-find / scipy fallback)."""
    ei = np.ascontiguousarray(ei, dtype=np.int64)
    ej = np.ascontiguousarray(ej, dtype=np.int64)
    lib = get_lib()
    if lib:
        out = np.empty(num_nodes, dtype=np.int64)
        lib.glomap_connected_components(
            num_nodes, len(ei), _ptr(ei, ctypes.c_int64),
            _ptr(ej, ctypes.c_int64), _ptr(out, ctypes.c_int64))
        return out
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as scc
    g = coo_matrix((np.ones(len(ei)), (ei, ej)), shape=(num_nodes, num_nodes))
    _, labels = scc(g, directed=False)
    return labels.astype(np.int64)
