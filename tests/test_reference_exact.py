"""Reference-exact mode guards (migration guide "every deviating default
in one table").

Two guarantees:

1. The parity harnesses cannot silently drift apart: every constructor
   kwarg pinned for a model in BOTH `parity/run_ours.py` and
   `parity/run_reference.py` must be pinned to the same literal value
   (known cross-framework renames aside), so the measured PARITY.md
   columns always compare byte-identical configs.
2. The deviating defaults the table documents stay restorable and loud:
   `feat_agg_mode="concat"` is pinned on the apples-to-apples DIN row,
   and the accepted-but-inert `use_tf_attention=True` warns instead of
   silently diverging from the reference's behavior switch (reference
   din.py:247).
"""
import ast
import warnings
from pathlib import Path

import pytest

PARITY = Path(__file__).resolve().parents[1] / "parity"

# kwargs that intentionally differ or don't exist on both sides
EXEMPT = {
    ("BPR", "use_tf"),  # reference backend selector, no analog here
}
# ours-name -> reference-name for the same semantic knob
RENAMES = {("SIM", "recent_num"): "short_max_len"}


def _model_kwargs(path):
    """{model_name: {kwarg: literal}} from the MODELS dict of a harness."""
    tree = ast.parse(path.read_text())
    out = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Assign) and node.targets
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "MODELS"):
            continue
        for key, val in zip(node.value.keys, node.value.values):
            name = key.value
            # ("kind", lambda di: Ctor(...)) — find the Call inside
            call = next(
                n for n in ast.walk(val) if isinstance(n, ast.Call)
            )
            kwargs = {}
            for kw in call.keywords:
                try:
                    kwargs[kw.arg] = ast.literal_eval(kw.value)
                except ValueError:
                    kwargs[kw.arg] = ast.dump(kw.value)  # e.g. epochs var
            out[name] = kwargs
    return out


def test_parity_harness_configs_match():
    ours = _model_kwargs(PARITY / "run_ours.py")
    ref = _model_kwargs(PARITY / "run_reference.py")
    shared = set(ours) & set(ref)
    assert len(shared) >= 20, f"parity matrix shrank: {sorted(shared)}"
    drift = []
    for model in sorted(shared):
        o, r = dict(ours[model]), dict(ref[model])
        for o_name, r_name in RENAMES.items():
            if o_name[0] == model and o_name[1] in o:
                o[r_name] = o.pop(o_name[1])
        for k in sorted(set(o) & set(r)):
            if (model, k) in EXEMPT:
                continue
            if o[k] != r[k]:
                drift.append(f"{model}.{k}: ours={o[k]!r} ref={r[k]!r}")
    assert not drift, "parity configs drifted:\n" + "\n".join(drift)


def test_parity_harness_pins_deviating_defaults():
    ours = _model_kwargs(PARITY / "run_ours.py")
    # row 1 of the table: the apples-to-apples DIN row pins the
    # reference's implicit token construction
    assert ours["DIN_feattok"]["feat_agg_mode"] == "concat"
    # use_bn=False must be pinned on every feat model of BOTH harnesses
    # (Keras-3 constraint documented in PARITY.md)
    ref = _model_kwargs(PARITY / "run_reference.py")
    for models in (ours, ref):
        for name in ("FM", "DeepFM", "DIN", "AutoInt", "YouTubeRanking"):
            assert models[name]["use_bn"] is False, (name, models[name])


def test_use_tf_attention_warns_not_silent(feat_builds):
    from librecommender_tpu.models import DIN

    *_, data_info = feat_builds
    with pytest.warns(UserWarning, match="use_tf_attention"):
        DIN("ranking", data_info, use_tf_attention=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DIN("ranking", data_info)  # default stays quiet
