"""Build/launch helpers for the native C++ serving server.

The server binary is compiled from server.cpp on first use (g++ -O3) and
launched as a subprocess against a flat-binary artifact directory produced
by :func:`export_native`. Mirrors the reference's Rust actix tier
(libserving/actix_serving) with the knn + embed endpoint families.
"""
import json
import socket
import subprocess
import time
from pathlib import Path

import numpy as np

from ...native.buildtools import build_native

_HERE = Path(__file__).parent
_BIN = _HERE / "server"
_SRC = _HERE / "server.cpp"


def build_server():
    # -march=native is safe here: the binary is always compiled from
    # source on first use on the serving host (hash-keyed, never shipped)
    return build_native(
        _SRC, _BIN,
        ["g++", "-O3", "-march=native", "-fno-math-errno", "-fopenmp",
         "-std=c++17", "-pthread", str(_SRC), "-o", str(_BIN)],
        extra_dep=[_HERE / "jaxpr_interp.hpp", _HERE / "model_runtime.hpp"],
    )


_INTERP_SRC = _HERE / "interp_cli.cpp"
_INTERP_BIN = _HERE / "interp_cli"


def build_interp_cli():
    """Golden-test driver for the native jaxpr interpreter."""
    return build_native(
        _INTERP_SRC, _INTERP_BIN,
        ["g++", "-O3", "-march=native", "-fno-math-errno", "-fopenmp",
         "-std=c++17", str(_INTERP_SRC), "-o", str(_INTERP_BIN)],
        extra_dep=_HERE / "jaxpr_interp.hpp",
    )


_BENCH_SRC = _HERE / "benchmark.cpp"
_BENCH_BIN = _HERE / "benchmark"


def build_benchmark():
    """Native load generator (reference analog: actix benchmark.rs);
    the Python client is GIL-bound and measures itself at high rates."""
    return build_native(
        _BENCH_SRC, _BENCH_BIN,
        ["g++", "-O3", "-std=c++17", "-pthread", str(_BENCH_SRC),
         "-o", str(_BENCH_BIN)],
    )


def export_native(path, model, ivf=False, n_ivf_clusters=None, n_probe=8,
                  programs=True, tile_size=None,
                  topk_via_interpreter=False):
    """Write flat binary artifacts the C++ server mmap-loads.

    Item ids must be integers (MovieLens-style); other id types serve
    through the Python tier.

    ``ivf=True`` additionally exports an IVF ANN index over the item
    embeddings; the server then answers /embed/recommend by probing
    ``n_probe`` clusters instead of scanning the catalog (the reference's
    actix embed tier is faiss-backed the same way, embed_deploy.rs).

    ``programs=True`` (default) also exports the model's scoring programs
    (serving/native_program.py) for feat/seq and dyn-embed models, so the
    server answers /model/recommend and /online/recommend by executing the
    program IN-PROCESS — the TF-Serving-runtime analog with no backend hop.

    ``topk_via_interpreter=True`` rebuilds the precomputed /model static
    top-K table THROUGH the C++ interpreter after export (server
    --build-topk), making the table bit-consistent with the live tiled
    fallback (the XLA-built default can flip near-ties against the
    interpreter's float-sum order — docs/serving_guide.md §4). Costs one
    full-catalog scoring pass per user at export time.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    data_info = model.data_info
    if programs:
        from ..native_program import export_native_programs

        export_native_programs(path, model, tile_size=tile_size)
    meta = {"n_items": int(model.n_items), "n_users": int(model.n_users)}
    if ivf:
        from ...retrieval.ivf import IVFIndex

        index = IVFIndex.build(
            np.asarray(model.item_embeds_np)[: model.n_items],
            n_clusters=n_ivf_clusters, seed=getattr(model, "seed", 0),
        )
        cent = np.ascontiguousarray(index.centroids, np.float32)
        lists = np.ascontiguousarray(index.lists, np.int32)
        np.asarray(cent.shape, np.int64).tofile(path / "ivf_centroids_shape.bin")
        cent.tofile(path / "ivf_centroids.bin")
        np.asarray(lists.shape, np.int64).tofile(path / "ivf_lists_shape.bin")
        lists.tofile(path / "ivf_lists.bin")
        meta["ivf_n_probe"] = int(n_probe)

    with open(path / "user2id.json", "w") as f:
        json.dump({str(u): int(i) for u, i in data_info.user2id.items()}, f)
    id2item = np.asarray(
        [int(data_info.id2item[i]) for i in range(model.n_items)], np.int64
    )
    id2item.tofile(path / "id2item_ints.bin")

    # consumed lists as CSR
    indptr = [0]
    indices = []
    for u in range(model.n_users):
        consumed = data_info.user_consumed.get(u, [])
        indices.extend(int(i) for i in consumed)
        indptr.append(len(indices))
    np.asarray(indptr, np.int64).tofile(path / "consumed_indptr.bin")
    np.asarray(indices, np.int32).tofile(path / "consumed_indices.bin")

    if getattr(model, "user_embeds_np", None) is not None:
        ue = np.ascontiguousarray(model.user_embeds_np, np.float32)
        ie = np.ascontiguousarray(model.item_embeds_np, np.float32)
        np.asarray(ue.shape, np.int64).tofile(path / "user_embed_shape.bin")
        ue.tofile(path / "user_embed.bin")
        np.asarray(ie.shape, np.int64).tofile(path / "item_embed_shape.bin")
        ie.tofile(path / "item_embed.bin")
    if getattr(model, "sim_ids", None) is not None:
        np.asarray(model.sim_ids.shape, np.int64).tofile(path / "sims_shape.bin")
        np.ascontiguousarray(model.sim_ids, np.int32).tofile(path / "sim_ids.bin")
        np.ascontiguousarray(model.sim_vals, np.float32).tofile(path / "sim_vals.bin")
        meta["cf_mode"] = model.cf_mode
        inter = model.interaction
        np.asarray(inter.indptr, np.int64).tofile(path / "inter_indptr.bin")
        np.asarray(inter.indices, np.int32).tofile(path / "inter_indices.bin")
        np.asarray(inter.data, np.float32).tofile(path / "inter_data.bin")
    with open(path / "native_meta.json", "w") as f:
        json.dump(meta, f)
    if topk_via_interpreter and programs:
        import subprocess

        binary = build_server()
        subprocess.run(
            [str(binary), str(path), "--build-topk"],
            check=True, capture_output=True,
        )
    return path


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def start_native_server(artifact_dir, port=None, n_threads=4, timeout=10.0,
                        backend=None):
    """Launch the server subprocess; returns (process, port).

    ``backend``: optional ``(host, port)`` of the Python scorer app — enables
    the native /model/recommend and /online/recommend endpoints (the
    TF-Serving-analog hop, reference actix tf_deploy.rs)."""
    binary = build_server()
    port = port or free_port()
    cmd = [str(binary), str(artifact_dir), str(port), str(n_threads)]
    if backend is not None:
        cmd += [str(backend[0]), str(backend[1])]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.5):
                return proc, port
        except OSError:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise RuntimeError(f"native server died: {out}")
            time.sleep(0.05)
    proc.kill()
    raise TimeoutError("native server did not start")
