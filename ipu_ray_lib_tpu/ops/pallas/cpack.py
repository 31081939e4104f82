"""ctypes bindings to the native blocked-table packer.

The packer (csrc/table_packer.cpp) performs the per-triangle f64
precompute of :func:`tables.build_blocked_tables` — plane/barycentric
columns, watertight bounds, shading-normal basis, material payload and
per-triangle AABBs — in one native pass, bitwise-identical to the numpy
expressions (compiled with -ffp-contract=off; gated by
tests/test_table_packer.py). The reference builds its scenes natively
too (ref: src/scene_utils.cpp); in numpy this pass dominated
multi-million-triangle imports.

Compiled on demand via ``make -C csrc``; callers fall back to the numpy
twin when the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB_NAME = "_native_pack.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        here = os.path.dirname(__file__)
        so = os.path.join(here, _LIB_NAME)
        if not os.path.exists(so):
            csrc = os.path.join(here, "..", "..", "..", "csrc")
            try:
                subprocess.run(
                    ["make", "-C", csrc], check=True,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
            except Exception:
                return None
        if not os.path.exists(so):
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        fn = lib.pack_blocked_tables
        fn.restype = ctypes.c_int
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        fn.argtypes = [
            f32p, i32p, f32p, u8p, i32p,           # verts, tri_v, vn, hasn, mat
            f32p, f32p, i32p, i32p, f32p,          # mat tables
            ctypes.c_int64, ctypes.c_int64,        # T, nb
            ctypes.c_double,                       # wt_scale
            ctypes.c_int64, ctypes.c_int32,        # sb, p8_layout
            f32p, f32p, f32p, f32p,                # p (or p8), nrm, tlo, thi
        ]
        _lib = lib
        return _lib


def pack_tables_native(verts, tri_v, vert_normals, has_normals, tri_mat,
                       mat_albedo, mat_ior, mat_type, mat_emissive,
                       mat_emission, nb, wt_scale, *,
                       p8_layout=False, sb=16):
    """Run the native packer; returns (p, nrm, tlo_p, thi_p) f32 arrays
    or None if the library is unavailable. Inputs must already be in
    treelet order; tri_mat must be pre-clipped to [0, M).

    With ``p8_layout=True`` the first output is the HBM-streaming super
    layout ([ns*TB, sb*16], tables.py p8 contract — bitwise the
    transpose of the row-layout p) written directly, skipping the p
    materialisation + transpose copy entirely; nb must then be a whole
    number of supers."""
    lib = _load()
    if lib is None:
        return None

    TB = 128
    T = len(tri_v)
    Tp = nb * TB
    if p8_layout and nb % sb:
        raise ValueError(f"p8_layout needs nb ({nb}) % sb ({sb}) == 0")
    verts = np.ascontiguousarray(verts, np.float32).reshape(-1, 3)
    tri_v = np.ascontiguousarray(tri_v, np.int32).reshape(-1, 3)
    has_n = np.ascontiguousarray(has_normals, np.uint8)
    tri_mat = np.ascontiguousarray(tri_mat, np.int32)
    mat_albedo = np.ascontiguousarray(mat_albedo, np.float32).reshape(-1, 3)
    mat_ior = np.ascontiguousarray(mat_ior, np.float32)
    mat_type = np.ascontiguousarray(mat_type, np.int32)
    mat_emissive = np.ascontiguousarray(mat_emissive, np.int32)
    mat_emission = np.ascontiguousarray(mat_emission, np.float32).reshape(-1, 3)
    if vert_normals is not None:
        vn = np.ascontiguousarray(vert_normals, np.float32).reshape(-1, 3)
        vn_ptr = vn.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        vn = None
        vn_ptr = ctypes.POINTER(ctypes.c_float)()

    p = np.zeros((Tp // sb, sb * 16) if p8_layout else (Tp, 16),
                 np.float32)
    nrm = np.zeros((8, nb * 3 * TB), np.float32)
    tlo = np.full((Tp, 3), np.inf, np.float32)
    thi = np.full((Tp, 3), -np.inf, np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.pack_blocked_tables(
        ptr(verts, ctypes.c_float), ptr(tri_v, ctypes.c_int32),
        vn_ptr, ptr(has_n, ctypes.c_uint8), ptr(tri_mat, ctypes.c_int32),
        ptr(mat_albedo, ctypes.c_float), ptr(mat_ior, ctypes.c_float),
        ptr(mat_type, ctypes.c_int32), ptr(mat_emissive, ctypes.c_int32),
        ptr(mat_emission, ctypes.c_float),
        ctypes.c_int64(T), ctypes.c_int64(nb), ctypes.c_double(wt_scale),
        ctypes.c_int64(sb), ctypes.c_int32(1 if p8_layout else 0),
        ptr(p, ctypes.c_float), ptr(nrm, ctypes.c_float),
        ptr(tlo, ctypes.c_float), ptr(thi, ctypes.c_float),
    )
    if rc != 0:
        return None
    return p, nrm, tlo, thi
