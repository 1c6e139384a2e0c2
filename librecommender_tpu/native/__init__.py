"""ctypes loader for the native CF kernels, with a numpy/scipy fallback.

The .so is compiled on first use with g++ -O3 -fopenmp and cached next to
the source; set LIBREC_TPU_NO_NATIVE=1 to force the pure-Python fallback
(used by tests to cross-check both paths).
"""
import ctypes
import os
from pathlib import Path

import numpy as np

from .buildtools import build_native

_HERE = Path(__file__).parent
_SO = _HERE / "_similarities.so"
_SRC = _HERE / "similarities.cpp"

_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", str(_SRC), "-o", str(_SO),
    ]
    build_native(_SRC, _SO, cmd)


def get_lib():
    """The loaded native library, or None if unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("LIBREC_TPU_NO_NATIVE"):
        return None
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        _build()
        lib = ctypes.CDLL(str(_SO))
        lib.topk_similarities.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.update_topk_similarities.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.csr_preprocess_transpose.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.swing_topk.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.cf_recommend.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.cf_predict.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - env without g++
        print(f"native kernels unavailable ({exc}); using numpy fallback")
        _lib = None
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


_PREPROCESS_KINDS = {"cosine": 0, "pearson": 1, "jaccard": 2, "transpose": 3}


def preprocess_transpose_native(x_csr, kind, n_threads=0):
    """Fused row-normalize + transpose (see similarities.cpp).

    Returns (x_norm, x_norm_T) as scipy CSR matrices sharing the kernel's
    output buffers (no extra copies). ``kind="transpose"`` skips the
    normalization and just transposes.
    """
    from scipy.sparse import csr_matrix

    lib = get_lib()
    assert lib is not None
    n_rows, n_cols = x_csr.shape
    xi = np.ascontiguousarray(x_csr.indptr, np.int64)
    xj = np.ascontiguousarray(x_csr.indices, np.int32)
    xd = np.ascontiguousarray(x_csr.data, np.float32)
    nnz = xd.shape[0]
    out_data = np.empty(nnz, np.float32)
    yt_indptr = np.empty(n_cols + 1, np.int64)
    yt_indices = np.empty(nnz, np.int32)
    yt_data = np.empty(nnz, np.float32)
    lib.csr_preprocess_transpose(
        _ptr(xi, ctypes.c_int64), _ptr(xj, ctypes.c_int32),
        _ptr(xd, ctypes.c_float), n_rows, n_cols,
        _PREPROCESS_KINDS[kind],
        _ptr(out_data, ctypes.c_float),
        _ptr(yt_indptr, ctypes.c_int64), _ptr(yt_indices, ctypes.c_int32),
        _ptr(yt_data, ctypes.c_float), n_threads,
    )
    x_norm = csr_matrix((out_data, xj, xi), shape=(n_rows, n_cols))
    x_norm_t = csr_matrix(
        (yt_data, yt_indices, yt_indptr), shape=(n_cols, n_rows)
    )
    return x_norm, x_norm_t


def topk_similarities_native(x_csr, yt_csr, n_y, x_nnz, y_nnz, k,
                             min_common, jaccard, exclude_self, n_threads=0):
    lib = get_lib()
    assert lib is not None
    n_x = x_csr.shape[0]
    out_ids = np.empty((n_x, k), np.int32)
    out_sims = np.empty((n_x, k), np.float32)
    xi = np.ascontiguousarray(x_csr.indptr, np.int64)
    xj = np.ascontiguousarray(x_csr.indices, np.int32)
    xd = np.ascontiguousarray(x_csr.data, np.float32)
    yi = np.ascontiguousarray(yt_csr.indptr, np.int64)
    yj = np.ascontiguousarray(yt_csr.indices, np.int32)
    yd = np.ascontiguousarray(yt_csr.data, np.float32)
    xn = np.ascontiguousarray(x_nnz, np.float32)
    yn = np.ascontiguousarray(y_nnz, np.float32)
    lib.topk_similarities(
        _ptr(xi, ctypes.c_int64), _ptr(xj, ctypes.c_int32),
        _ptr(xd, ctypes.c_float), n_x,
        _ptr(yi, ctypes.c_int64), _ptr(yj, ctypes.c_int32),
        _ptr(yd, ctypes.c_float), x_csr.shape[1], n_y,
        _ptr(xn, ctypes.c_float), _ptr(yn, ctypes.c_float),
        k, min_common, int(jaccard), int(exclude_self),
        _ptr(out_ids, ctypes.c_int32), _ptr(out_sims, ctypes.c_float),
        n_threads,
    )
    return out_ids, out_sims


def update_topk_similarities_native(x_csr, yt_csr, x_nnz, touched, old_ids,
                                    old_sims, k, min_common, jaccard,
                                    n_threads=0):
    lib = get_lib()
    assert lib is not None
    n_x = x_csr.shape[0]
    n_x_old = old_ids.shape[0]
    out_ids = np.empty((n_x, k), np.int32)
    out_sims = np.empty((n_x, k), np.float32)
    xi = np.ascontiguousarray(x_csr.indptr, np.int64)
    xj = np.ascontiguousarray(x_csr.indices, np.int32)
    xd = np.ascontiguousarray(x_csr.data, np.float32)
    yi = np.ascontiguousarray(yt_csr.indptr, np.int64)
    yj = np.ascontiguousarray(yt_csr.indices, np.int32)
    yd = np.ascontiguousarray(yt_csr.data, np.float32)
    xn = np.ascontiguousarray(x_nnz, np.float32)
    tr = np.ascontiguousarray(touched, np.int32)
    oi = np.ascontiguousarray(old_ids, np.int32)
    os_ = np.ascontiguousarray(old_sims, np.float32)
    lib.update_topk_similarities(
        _ptr(xi, ctypes.c_int64), _ptr(xj, ctypes.c_int32),
        _ptr(xd, ctypes.c_float), n_x,
        _ptr(yi, ctypes.c_int64), _ptr(yj, ctypes.c_int32),
        _ptr(yd, ctypes.c_float), x_csr.shape[1],
        _ptr(xn, ctypes.c_float),
        _ptr(tr, ctypes.c_int32), len(tr),
        _ptr(oi, ctypes.c_int32), _ptr(os_, ctypes.c_float), n_x_old,
        k, min_common, int(jaccard),
        _ptr(out_ids, ctypes.c_int32), _ptr(out_sims, ctypes.c_float),
        n_threads,
    )
    return out_ids, out_sims


def swing_topk_native(user_items_csr, item_users_csr, alpha, k, n_threads=0):
    lib = get_lib()
    assert lib is not None
    n_users = user_items_csr.shape[0]
    n_items = item_users_csr.shape[0]
    out_ids = np.empty((n_items, k), np.int32)
    out_sims = np.empty((n_items, k), np.float32)
    ui = np.ascontiguousarray(user_items_csr.indptr, np.int64)
    uj = np.ascontiguousarray(user_items_csr.indices, np.int32)
    ii = np.ascontiguousarray(item_users_csr.indptr, np.int64)
    ij = np.ascontiguousarray(item_users_csr.indices, np.int32)
    lib.swing_topk(
        _ptr(ui, ctypes.c_int64), _ptr(uj, ctypes.c_int32), n_users,
        _ptr(ii, ctypes.c_int64), _ptr(ij, ctypes.c_int32), n_items,
        float(alpha), k,
        _ptr(out_ids, ctypes.c_int32), _ptr(out_sims, ctypes.c_float),
        n_threads,
    )
    return out_ids, out_sims


def cf_recommend_native(cf_mode, task_rating, sim_ids, sim_vals, inter_csr,
                        users, n_rec, filter_consumed, popular, n_threads=0):
    """Batch CF recommend off cached top-k sims (recfarm inference.rs
    analog; see cf_recommend in similarities.cpp). Returns
    (ids (n_query, n_rec) int32 with -1 padding, scores float32)."""
    lib = get_lib()
    assert lib is not None
    si = np.ascontiguousarray(sim_ids, np.int32)
    sv = np.ascontiguousarray(sim_vals, np.float32)
    ii = np.ascontiguousarray(inter_csr.indptr, np.int64)
    ij = np.ascontiguousarray(inter_csr.indices, np.int32)
    idt = np.ascontiguousarray(inter_csr.data, np.float32)
    us = np.ascontiguousarray(users, np.int32)
    pop = np.ascontiguousarray(popular, np.int32)
    n_query = us.shape[0]
    out_ids = np.empty((n_query, n_rec), np.int32)
    out_scores = np.empty((n_query, n_rec), np.float32)
    lib.cf_recommend(
        int(cf_mode), int(task_rating),
        _ptr(si, ctypes.c_int32), _ptr(sv, ctypes.c_float), si.shape[1],
        _ptr(ii, ctypes.c_int64), _ptr(ij, ctypes.c_int32),
        _ptr(idt, ctypes.c_float), inter_csr.shape[0], inter_csr.shape[1],
        _ptr(us, ctypes.c_int32), n_query,
        int(n_rec), int(filter_consumed),
        _ptr(pop, ctypes.c_int32), pop.shape[0],
        _ptr(out_ids, ctypes.c_int32), _ptr(out_scores, ctypes.c_float),
        n_threads,
    )
    return out_ids, out_scores


def cf_predict_native(cf_mode, task_rating, sim_ids, sim_vals, inter_csr,
                      users, items, default_pred, n_threads=0):
    """Pairwise CF predict off cached top-k sims (see cf_predict in
    similarities.cpp). Out-of-range ids get default_pred."""
    lib = get_lib()
    assert lib is not None
    si = np.ascontiguousarray(sim_ids, np.int32)
    sv = np.ascontiguousarray(sim_vals, np.float32)
    ii = np.ascontiguousarray(inter_csr.indptr, np.int64)
    ij = np.ascontiguousarray(inter_csr.indices, np.int32)
    idt = np.ascontiguousarray(inter_csr.data, np.float32)
    us = np.ascontiguousarray(users, np.int32)
    it = np.ascontiguousarray(items, np.int32)
    out = np.empty(us.shape[0], np.float32)
    lib.cf_predict(
        int(cf_mode), int(task_rating),
        _ptr(si, ctypes.c_int32), _ptr(sv, ctypes.c_float), si.shape[1],
        _ptr(ii, ctypes.c_int64), _ptr(ij, ctypes.c_int32),
        _ptr(idt, ctypes.c_float), inter_csr.shape[0], inter_csr.shape[1],
        _ptr(us, ctypes.c_int32), _ptr(it, ctypes.c_int32), us.shape[0],
        float(default_pred), _ptr(out, ctypes.c_float), n_threads,
    )
    return out


_HNSW_SO = _HERE / "_hnsw.so"
_HNSW_SRC = _HERE / "hnsw.cpp"
_hnsw_lib = None
_hnsw_tried = False


def get_hnsw_lib():
    """The native HNSW library, or None (brute-force fallback)."""
    global _hnsw_lib, _hnsw_tried
    if os.environ.get("LIBREC_TPU_NO_NATIVE"):
        return None
    if _hnsw_lib is not None or _hnsw_tried:
        return _hnsw_lib
    _hnsw_tried = True
    try:
        build_native(
            _HNSW_SRC, _HNSW_SO,
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             "-std=c++17", str(_HNSW_SRC), "-o", str(_HNSW_SO)],
        )
        lib = ctypes.CDLL(str(_HNSW_SO))
        lib.hnsw_build.restype = ctypes.c_void_p
        lib.hnsw_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        lib.hnsw_search.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.hnsw_blob_size.restype = ctypes.c_int64
        lib.hnsw_blob_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_serialize.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.hnsw_deserialize.restype = ctypes.c_void_p
        lib.hnsw_deserialize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        _hnsw_lib = lib
    except Exception:  # noqa: BLE001 — fall back to exact search
        _hnsw_lib = None
    return _hnsw_lib
