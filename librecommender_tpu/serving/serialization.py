"""Serving artifact export.

Reference parity: libserving/serialization/{knn,embed,online,common}.py —
each saver writes a JSON+npz artifact directory with the model name, id
maps, consumed lists and the model-family payload:

- knn:    top-k similarity lists (UserCF/ItemCF/Swing)
- embed:  user/item embedding matrices (EmbedBase family)
- online: full model checkpoint (params + DataInfo) for dynamic
  feature/sequence scoring (subsumes the reference's `save_tf` SavedModel
  path — the jitted forward is reconstructed from params at load)
"""
import json
from pathlib import Path

import numpy as np


def _common(path, model):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    data_info = model.data_info
    with open(path / "model_meta.json", "w") as f:
        json.dump(
            {
                "model_name": model.model_name,
                "model_category": _category(model),
                "n_users": int(model.n_users),
                "n_items": int(model.n_items),
            },
            f, indent=2,
        )
    with open(path / "id_mapping.json", "w") as f:
        json.dump(
            {
                "user2id": {str(u): int(i) for u, i in data_info.user2id.items()},
                "id2item": {str(i): _py(v) for i, v in data_info.id2item.items()},
            },
            f,
        )
    with open(path / "user_consumed.json", "w") as f:
        json.dump(
            {str(u): [int(i) for i in items]
             for u, items in data_info.user_consumed.items()},
            f,
        )
    return path


def _py(v):
    return v.item() if isinstance(v, np.generic) else v


def _category(model):
    from ..bases.cf_base import CfBase
    from ..bases.embed_base import EmbedBase

    if isinstance(model, CfBase):
        return "knn"
    if isinstance(model, EmbedBase):
        return "embed"
    return "model"


def save_knn(path, model, k_sim=20):
    """Export top-k similarity lists (reference serialization/knn.py:16)."""
    path = _common(path, model)
    np.savez_compressed(
        path / "knn_sims",
        sim_ids=model.sim_ids[:, :k_sim],
        sim_vals=model.sim_vals[:, :k_sim],
        cf_mode=np.asarray([model.cf_mode]),
    )
    np.savez_compressed(
        path / "interaction",
        data=model.interaction.data,
        indices=model.interaction.indices,
        indptr=model.interaction.indptr,
    )
    return path


def save_embed(path, model):
    """Export user/item embeddings (reference serialization/embed.py:16)."""
    path = _common(path, model)
    np.savez_compressed(
        path / "embeddings",
        user_embed=model.user_embeds_np,
        item_embed=model.item_embeds_np,
    )
    return path


def save_ivf_index(path, model, n_clusters=None, n_probe=8):
    """Build + export the IVF ANN index over the item embeddings
    (reference `save_faiss_index`, serialization/embed.py:42)."""
    from ..retrieval.ivf import IVFIndex

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    index = IVFIndex.build(
        model.item_embeds_np[:-1], n_clusters=n_clusters, seed=model.seed
    )
    index.save(path)
    with open(path / "ivf_config.json", "w") as f:
        json.dump({"n_probe": n_probe}, f)
    return index


def save_online(path, model):
    """Export the full model for online dynamic scoring
    (reference serialization/online.py:23 + tfmodel.py:17)."""
    path = _common(path, model)
    model.save(str(path), model.model_name)
    return path
