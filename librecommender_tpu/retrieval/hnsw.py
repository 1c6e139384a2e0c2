"""HNSW approximate nearest-neighbor index (native C++ backend).

Reference parity: nmslib HNSW behind `init_knn(approximate=True)`
(libreco/bases/embed_base.py:415-470) — same role, same tuning knobs
(M / ef_construction / ef_search), implemented from scratch in
native/hnsw.cpp. Inner-product similarity; pre-normalize for cosine.

With LIBREC_TPU_NO_NATIVE=1 (or a failed toolchain) the index degrades
to exact brute-force search — identical API, recall 1.0, O(n) per query.
Measured recall/latency vs exact and vs IVF: docs/serving_guide.md.
"""
import ctypes

import numpy as np

from ..native import get_hnsw_lib


class HNSWIndex:
    def __init__(self, handle, vectors, lib, M, ef_construction):
        self._handle = handle            # None => brute-force fallback
        self._lib = lib
        self.vectors = vectors           # (n, d) f32, C-contiguous
        self.M = M
        self.ef_construction = ef_construction

    @classmethod
    def build(cls, vectors, M=16, ef_construction=200, seed=42):
        vectors = np.ascontiguousarray(vectors, np.float32)
        lib = get_hnsw_lib()
        if lib is None:
            return cls(None, vectors, None, M, ef_construction)
        n, d = vectors.shape
        handle = lib.hnsw_build(
            vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n), ctypes.c_int64(d),
            ctypes.c_int(M), ctypes.c_int(ef_construction),
            ctypes.c_uint64(seed),
        )
        return cls(handle, vectors, lib, M, ef_construction)

    def search(self, queries, k, ef_search=200, n_probe=None):
        """(nq, d) queries -> (ids (nq, k) int32 [-1 pads], scores).
        ``n_probe`` accepted for IVF API compatibility; ignored."""
        queries = np.ascontiguousarray(
            np.atleast_2d(np.asarray(queries, np.float32))
        )
        nq, d = queries.shape
        if d != self.vectors.shape[1]:
            raise ValueError(
                f"query dim {d} != indexed vector dim {self.vectors.shape[1]}"
            )
        k = int(min(k, self.vectors.shape[0]))
        if self._handle is None:  # exact fallback
            sims = queries @ self.vectors.T
            ids = np.argsort(-sims, axis=1)[:, :k].astype(np.int32)
            return ids, np.take_along_axis(sims, ids, axis=1)
        ids = np.empty((nq, k), np.int32)
        scores = np.empty((nq, k), np.float32)
        self._lib.hnsw_search(
            self._handle,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(nq), ctypes.c_int64(d),
            ctypes.c_int(k), ctypes.c_int(max(int(ef_search), k)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return ids, scores

    # ---------------------------------------------------------- persistence
    def save(self, path, name="hnsw"):
        from pathlib import Path

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.save(path / f"{name}_vectors.npy", self.vectors)
        if self._handle is not None:
            size = self._lib.hnsw_blob_size(self._handle)
            buf = ctypes.create_string_buffer(size)
            self._lib.hnsw_serialize(self._handle, buf)
            (path / f"{name}_graph.bin").write_bytes(buf.raw)

    @classmethod
    def load(cls, path, name="hnsw"):
        from pathlib import Path

        path = Path(path)
        vectors = np.ascontiguousarray(
            np.load(path / f"{name}_vectors.npy"), np.float32
        )
        lib = get_hnsw_lib()
        graph = path / f"{name}_graph.bin"
        if lib is None or not graph.exists():
            return cls(None, vectors, None, 16, 200)
        blob = graph.read_bytes()
        handle = lib.hnsw_deserialize(
            vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            blob, ctypes.c_int64(len(blob)),
        )
        return cls(handle, vectors, lib, 16, 200)

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib:
            try:
                self._lib.hnsw_free(self._handle)
            except Exception:  # noqa: BLE001 — interpreter teardown
                pass
