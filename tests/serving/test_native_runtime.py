"""Golden parity tests for the native jaxpr runtime: the same scoring
function executed by jax (CPU) and by the C++ interpreter
(native_server/jaxpr_interp.hpp) on programs serialized by
serving/native_program.py must agree.

Covers every primitive family the framework's scorers emit: dot_general,
gather, broadcast/reshape/transpose/tile/concat/slice, reductions,
elementwise, scan (GRU), conv_general_dilated (Caser/WaveNet), pad,
dynamic_slice, is_finite/select_n (SIM GSU masking).
"""
import json
import subprocess

import numpy as np
import pandas as pd
import pytest

from librecommender_tpu.data import DatasetFeat, DatasetPure
from librecommender_tpu.serving.native_program import save_program
from librecommender_tpu.serving.native_server import build_interp_cli


@pytest.fixture(scope="module")
def tiny_feat():
    rng = np.random.default_rng(0)
    n = 300
    frame = pd.DataFrame({
        "user": rng.integers(0, 40, n), "item": rng.integers(0, 60, n),
        "label": np.ones(n), "sex": rng.integers(0, 2, n),
        "genre": rng.integers(0, 5, n), "age": rng.normal(size=n),
    }).drop_duplicates(subset=["user", "item"])
    return DatasetFeat.build_trainset(
        frame, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )


@pytest.fixture(scope="module")
def tiny_pure():
    rng = np.random.default_rng(1)
    n = 300
    frame = pd.DataFrame({
        "user": rng.integers(0, 40, n), "item": rng.integers(0, 60, n),
        "label": np.ones(n),
    }).drop_duplicates(subset=["user", "item"])
    return DatasetPure.build_trainset(frame)


def run_native(tmp_path, name, fn, *inputs, rtol=2e-5, atol=2e-5):
    """Serialize fn, execute natively, compare against the jax output."""
    save_program(tmp_path, name, fn, *inputs)
    io_dir = tmp_path / f"{name}_io"
    io_dir.mkdir(exist_ok=True)
    for k, a in enumerate(inputs):
        arr = np.asarray(a)
        if arr.dtype.kind == "f":
            arr = arr.astype(np.float32)
        else:
            arr = arr.astype(np.int32)
        arr.tofile(io_dir / f"input_{k}.bin")
    cli = build_interp_cli()
    res = subprocess.run(
        [str(cli), str(tmp_path / f"{name}.program.json"),
         str(tmp_path / f"{name}.blob.bin"), str(io_dir)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    out_meta = json.loads((io_dir / "outputs.json").read_text())
    expected = fn(*inputs)
    if not isinstance(expected, (tuple, list)):
        expected = (expected,)
    assert len(out_meta) == len(expected)
    for k, (m, exp) in enumerate(zip(out_meta, expected)):
        exp = np.asarray(exp)
        dt = np.float32 if m["dtype"] == "f32" else np.int64
        got = np.fromfile(io_dir / f"output_{k}.bin", dtype=dt).reshape(
            m["shape"]
        )
        assert list(got.shape) == list(exp.shape)
        if exp.dtype.kind == "f":
            np.testing.assert_allclose(
                got, np.asarray(exp, np.float32), rtol=rtol, atol=atol
            )
        else:
            np.testing.assert_array_equal(got, exp.astype(np.int64))
    return True


def _catalog_fn(model):
    params = model.params
    if hasattr(model, "_score_catalog"):
        return lambda u: model._score_catalog(params, u, int(1))
    return lambda u: model._recommend_fn.__wrapped__(params, u, 1)


def test_native_fm_catalog(tiny_feat, tmp_path):
    from librecommender_tpu.models import FM

    _, di = tiny_feat
    m = FM("ranking", di, embed_size=8, n_epochs=1)
    m.build_model()
    m._ensure_inference_fns()
    users = np.zeros(1, np.int32)
    run_native(tmp_path, "fm", _catalog_fn(m), users)


@pytest.mark.parametrize("cls_name", ["AutoInt", "WideDeep", "NCF",
                                      "YouTubeRanking", "DeepFM"])
def test_native_more_families(tiny_feat, tmp_path, cls_name):
    """The remaining CTR families run through the same runtime."""
    import librecommender_tpu.models as M

    _, di = tiny_feat
    kw = {"hidden_units": (16,)} if cls_name != "AutoInt" else {}
    if cls_name == "YouTubeRanking":
        kw["recent_num"] = 5
    m = getattr(M, cls_name)("ranking", di, embed_size=8, n_epochs=1, **kw)
    m.build_model()
    m._ensure_inference_fns()
    users = np.asarray([2], np.int32)
    run_native(tmp_path, cls_name.lower(), _catalog_fn(m), users)


def test_native_din_catalog(tiny_feat, tmp_path):
    from librecommender_tpu.models import DIN

    _, di = tiny_feat
    m = DIN("ranking", di, embed_size=8, n_epochs=1, recent_num=5,
            hidden_units=(16,))
    m.build_model()
    m._ensure_inference_fns()
    users = np.asarray([3], np.int32)
    run_native(tmp_path, "din", _catalog_fn(m), users)


def test_native_sim_catalog(tiny_feat, tmp_path):
    from librecommender_tpu.models import SIM

    _, di = tiny_feat
    m = SIM("ranking", di, embed_size=8, n_epochs=1, recent_num=5,
            long_max_len=10, search_topk=3, hidden_units=(16,))
    m.build_model()
    m._ensure_inference_fns()
    users = np.asarray([2], np.int32)
    run_native(tmp_path, "sim", _catalog_fn(m), users)


def test_native_transformer_catalog(tiny_feat, tmp_path):
    from librecommender_tpu.models import Transformer

    _, di = tiny_feat
    m = Transformer("ranking", di, embed_size=8, n_epochs=1, recent_num=5,
                    hidden_units=(16,))
    m.build_model()
    m._ensure_inference_fns()
    users = np.asarray([1], np.int32)
    # bf16 default compute: rounded-through constants + f32 compute in the
    # interpreter vs true-bf16 XLA ops — compare at bf16-level tolerance
    run_native(tmp_path, "tfm", _catalog_fn(m), users, rtol=2e-2, atol=2e-2)


def test_native_rnn4rec_tower(tiny_pure, tmp_path):
    """GRU user tower: exercises scan + split + tanh/logistic."""
    from librecommender_tpu.models import RNN4Rec

    _, di = tiny_pure
    m = RNN4Rec("ranking", di, embed_size=8, n_epochs=1)
    m.build_model()
    params = m.params
    users = np.asarray([5], np.int32)
    seqs = np.asarray(m.recent_seq_table)[users.astype(int)].astype(np.int32)
    run_native(
        tmp_path, "rnn",
        lambda u, s: m._user_repr(params, u, s, False, None), users, seqs,
    )


def test_native_caser_tower(tiny_pure, tmp_path):
    """Horizontal+vertical CNN tower: conv_general_dilated."""
    from librecommender_tpu.models import Caser

    _, di = tiny_pure
    m = Caser("ranking", di, embed_size=8, n_epochs=1)
    m.build_model()
    params = m.params
    users = np.asarray([7], np.int32)
    seqs = np.asarray(m.recent_seq_table)[users.astype(int)].astype(np.int32)
    run_native(
        tmp_path, "caser",
        lambda u, s: m._user_repr(params, u, s, False, None), users, seqs,
    )


def test_native_wavenet_tower(tiny_pure, tmp_path):
    """Dilated causal convs: conv + pad + dynamic_slice."""
    from librecommender_tpu.models import WaveNet

    _, di = tiny_pure
    m = WaveNet("ranking", di, embed_size=8, n_epochs=1)
    m.build_model()
    params = m.params
    users = np.asarray([9], np.int32)
    seqs = np.asarray(m.recent_seq_table)[users.astype(int)].astype(np.int32)
    run_native(
        tmp_path, "wavenet",
        lambda u, s: m._user_repr(params, u, s, False, None), users, seqs,
    )


def test_native_din_overrides(tiny_feat, tmp_path):
    """The dynamic-override catalog scorer (online family) runs natively:
    per-user seq + feature rows as program inputs."""
    from librecommender_tpu.models import DIN

    _, di = tiny_feat
    m = DIN("ranking", di, embed_size=8, n_epochs=1, recent_num=5,
            hidden_units=(16,))
    m.build_model()
    m._ensure_inference_fns()
    params = m.params
    users = np.asarray([3], np.int32)
    seq = np.asarray([[60, 60, 1, 2, 3]], np.int32)
    u_sp = np.asarray(di.user_sparse_unique)[users.astype(int)].astype(np.int32)
    u_ds = np.asarray(di.user_dense_unique)[users.astype(int)].astype(np.float32)

    def fn(u, s, usp, uds):
        return m._score_catalog(
            params, u, 1,
            overrides={"seq": s, "user_sparse_row": usp,
                       "user_dense_row": uds},
        )

    run_native(tmp_path, "din_dyn", fn, users, seq, u_sp, u_ds)


def test_topk_via_interpreter_matches_xla_table(tiny_feat, tmp_path):
    """export_native(topk_via_interpreter=True) rebuilds the /model
    static table through the C++ interpreter (server --build-topk). On
    CPU the interpreter is exact f32 == the XLA scorer, so the two
    builders must agree bit-for-bit; on TPU-exported artifacts the
    interpreter build is the one bit-consistent with the live fallback
    (docs/serving_guide.md §4)."""
    from librecommender_tpu.models import DIN
    from librecommender_tpu.serving.native_server import export_native

    train, di = tiny_feat
    m = DIN("ranking", di, embed_size=8, n_epochs=1, batch_size=128,
            recent_num=5, hidden_units=(16,))
    m.fit(train, neg_sampling=True, verbose=0)
    p_xla = export_native(tmp_path / "xla", m)
    p_int = export_native(tmp_path / "interp", m,
                          topk_via_interpreter=True)
    s1 = np.fromfile(p_xla / "static_topk_shape.bin", np.int64)
    s2 = np.fromfile(p_int / "static_topk_shape.bin", np.int64)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(
        np.fromfile(p_xla / "static_topk.bin", np.int32),
        np.fromfile(p_int / "static_topk.bin", np.int32),
    )
