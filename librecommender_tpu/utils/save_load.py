"""Model persistence: hyper-params + params pytree + DataInfo.

Reference parity: libreco/utils/save_load.py:11-112 (init-arg capture via
``all_args``, weights as npz / state_dict). Here a model is three artifacts:

- ``{name}_hyper_params.pkl``  — init kwargs captured from ``all_args``
- ``{name}_params.pkl``        — the params pytree with numpy leaves
- DataInfo's own files         — via ``DataInfo.save``
"""
import pickle
from pathlib import Path

import jax
import numpy as np


def save_hyper_params(path, model, extra=None):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    hparams = {k: v for k, v in model.all_args.items()}
    hparams["model_class"] = model.__class__.__name__
    if extra:
        hparams.update(extra)
    with open(path / f"{model.model_name}_hyper_params.pkl", "wb") as f:
        pickle.dump(hparams, f, pickle.HIGHEST_PROTOCOL)


def load_hyper_params(path, model_name):
    with open(Path(path) / f"{model_name}_hyper_params.pkl", "rb") as f:
        return pickle.load(f)


def save_params(path, model):
    """Persist the params pytree with numpy leaves (device -> host once)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = jax.device_get(model.params)
    with open(path / f"{model.model_name}_params.pkl", "wb") as f:
        pickle.dump(host_params, f, pickle.HIGHEST_PROTOCOL)


def load_params(path, model_name):
    with open(Path(path) / f"{model_name}_params.pkl", "rb") as f:
        return pickle.load(f)


def save_default_recs(path, model):
    if model.default_recs is not None:
        np.savez_compressed(
            Path(path) / f"{model.model_name}_default_recs",
            default_recs=np.asarray(model.default_recs),
        )


def load_default_recs(path, model_name):
    p = Path(path) / f"{model_name}_default_recs.npz"
    if p.exists():
        return np.load(p)["default_recs"]
    return None
