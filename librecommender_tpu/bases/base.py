"""Abstract model contract: fit / predict / recommend_user / save / load.

Reference parity: libreco/bases/base.py:8-141 — task handling (rating score
clipping vs ranking probabilities), default predictions/recommendations for
cold users, and the shared fit() skeleton that dispatches into the single
JAX trainer (replacing the reference's per-backend trainer classes).
"""
import abc
import time

import jax
import numpy as np

from ..evaluation.evaluate import print_metrics
from ..training.trainer import Trainer
from ..utils.misc import colorize
from ..utils.save_load import (
    load_default_recs,
    load_hyper_params,
    load_params,
    save_default_recs,
    save_hyper_params,
    save_params,
)
from ..utils.validate import check_fitting, check_unknown_user


class Base(abc.ABC):
    """Base for all models.

    Parameters
    ----------
    task : {"rating", "ranking"}
    data_info : DataInfo
    lower_upper_bound : tuple or None
        Score clipping bounds for rating task.
    """

    # training paradigm consumed by the Trainer/BatchGenerator
    paradigm = "pointwise"

    def __init__(self, task, data_info, lower_upper_bound=None, seed=42):
        self.model_name = self.__class__.__name__
        self.task = task
        self.data_info = data_info
        self.n_users = data_info.n_users
        self.n_items = data_info.n_items
        self.user_consumed = data_info.user_consumed
        self.seed = seed
        self.params = None
        self.default_recs = None
        self.loaded = False
        if task == "rating":
            self.global_mean = float(data_info.global_mean)
            if lower_upper_bound is not None:
                assert isinstance(lower_upper_bound, (list, tuple))
                self.lower_bound, self.upper_bound = lower_upper_bound
            else:
                self.lower_bound, self.upper_bound = data_info.min_max_rating
        elif task != "ranking":
            raise ValueError("task must be 'rating' or 'ranking'")

    # ------------------------------------------------------------ training
    @abc.abstractmethod
    def build_model(self):
        """Initialize ``self.params`` (pure pytree)."""

    @abc.abstractmethod
    def loss_fn(self, params, batch, rng):
        """Pure scalar loss over one batch (traced under jit)."""

    def _custom_optimizer(self):
        """Optional optax optimizer override (e.g. WideDeep's FTRL+Adam)."""
        return None

    def post_epoch(self):
        """Refresh any cached inference state after an epoch (e.g. embeddings)."""

    def post_fit(self):
        """Finalize inference state after training (OOV rows, default recs)."""

    def fit(
        self,
        train_data,
        neg_sampling,
        verbose=1,
        shuffle=True,
        eval_data=None,
        metrics=None,
        k=10,
        eval_batch_size=8192,
        eval_user_num=None,
        num_workers=0,
        mesh=None,
        profile_dir=None,
        checkpoint_dir=None,
        checkpoint_every=1,
        early_stopping=None,
    ):
        """Train the model on transformed train data.

        ``mesh``: optional ``jax.sharding.Mesh(('data', 'model'))`` (see
        ``parallel.build_mesh``) — batches shard over `data`, embedding
        tables row-shard over `model`.
        ``profile_dir``: write a ``jax.profiler`` trace of one steady-state
        epoch for tensorboard/xprof.
        ``early_stopping``: patience in epochs (requires ``eval_data``) —
        stop when the FIRST entry of ``metrics`` hasn't improved for that
        many epochs and restore the best parameters. Beyond the reference
        (which trains a fixed epoch count); motivated by the tiny-data
        overfit study in PARITY.md.
        """
        if verbose > 0:
            start = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
            print(f"Training start time: {colorize(start, 'magenta')}")
        check_fitting(self, train_data, eval_data, neg_sampling, k)
        if self.params is None:
            self.build_model()
        trainer = Trainer(
            self,
            n_epochs=self.n_epochs,
            lr=self.lr,
            lr_decay=self.lr_decay,
            epsilon=self.epsilon,
            batch_size=self.batch_size,
            sampler=getattr(self, "sampler", "random"),
            num_neg=getattr(self, "num_neg", 1),
            optimizer=self._custom_optimizer(),
            mesh=mesh,
        )
        trainer.run(
            train_data,
            neg_sampling,
            verbose,
            shuffle,
            eval_data,
            metrics,
            k=k,
            eval_batch_size=eval_batch_size,
            eval_user_num=eval_user_num,
            profile_dir=profile_dir,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            early_stopping=early_stopping,
        )
        self.trainer = trainer
        self.post_fit()
        if verbose > 1 and eval_data is not None:
            print_metrics(
                self,
                eval_data=eval_data,
                metrics=metrics,
                eval_batch_size=eval_batch_size,
                k=k,
                sample_user_num=eval_user_num,
                seed=self.seed,
                neg_sampling=neg_sampling,
            )

    # ----------------------------------------------------------- inference
    @abc.abstractmethod
    def predict(self, user, item, inner_id=False, cold_start="average"):
        """Predict scores (rating) or probabilities (ranking) for pairs."""

    @abc.abstractmethod
    def recommend_user(
        self,
        user,
        n_rec,
        inner_id=False,
        cold_start="average",
        filter_consumed=True,
        random_rec=False,
    ):
        """Recommend n_rec items per user; returns {user: item array}."""

    def convert_ids(self, user, item, inner_id):
        """Map raw ids to inner ids; unknowns get the OOV index."""
        user = np.atleast_1d(np.asarray(user))
        item = np.atleast_1d(np.asarray(item))
        if not inner_id:
            user = np.array([self.data_info.user2id.get(u, self.n_users) for u in user])
            item = np.array([self.data_info.item2id.get(i, self.n_items) for i in item])
        user = np.clip(user.astype(np.int64), 0, self.n_users)
        item = np.clip(item.astype(np.int64), 0, self.n_items)
        return user, item

    def split_cold_users(self, user, inner_id):
        return check_unknown_user(self.data_info, user, inner_id)

    def finalize_rec(self, computed, users_order, inner_id):
        """Map inner item ids back to raw ids unless inner_id requested."""
        if inner_id:
            return computed
        id2item = self.data_info.id2item
        return {
            u: np.asarray([id2item.get(int(i), i) for i in recs])
            for u, recs in computed.items()
        }

    def build_default_recs(self, num=100):
        """Average-user recommendations used for cold-start 'average'."""
        try:
            recs = self._default_rec_source(num)
        except NotImplementedError:
            recs = None
        self.default_recs = recs

    def _default_rec_source(self, num):
        raise NotImplementedError

    # ------------------------------------------------------------- retrain
    def rebuild_model(self, path, model_name=None):
        """Graft a previously-saved model's weights (and optimizer state)
        into this instance built against an enlarged vocabulary
        (reference: tfops/rebuild.py:12, torchops/rebuild.py:13). Call after
        ``merge_trainset`` produced the new DataInfo, then ``fit`` to
        continue training."""
        from ..training.rebuild import graft_params
        from ..utils.save_load import load_opt_state, load_params

        assert self.data_info.old_info is not None, (
            "rebuild_model requires a DataInfo produced by merge_trainset"
        )
        if model_name is not None:
            self.model_name = model_name
        if self.params is None:
            self.build_model()
        old_params = load_params(path, self.model_name)
        self.params = graft_params(old_params, self.params, self.data_info)
        old_opt = load_opt_state(path, self.model_name)
        if old_opt is not None:
            self._initial_opt_state = ("graft", old_opt)
        return self

    def load_checkpoint(self, checkpoint_dir):
        """Resume from a mid-training checkpoint written by
        ``fit(checkpoint_dir=...)``; returns the epoch it was taken at."""
        from pathlib import Path

        import jax.numpy as jnp

        from ..utils.save_load import unflatten_tree

        p = Path(checkpoint_dir) / "checkpoint.npz"
        if p.exists():
            with np.load(p) as data:
                epoch = int(data["epoch"])
                params = unflatten_tree(
                    {k[2:]: data[k] for k in data.files if k.startswith("p:")}
                )
                opt_leaves = [
                    data[k] for k in sorted(data.files) if k.startswith("o:")
                ]
            restore = ("restore", ("leaves", opt_leaves))
        else:  # legacy rounds wrote pickle checkpoints
            import pickle

            with open(Path(checkpoint_dir) / "checkpoint.pkl", "rb") as f:
                state = pickle.load(f)
            epoch = state["epoch"]
            params = state["params"]
            restore = ("restore", ("pytree", state["opt_state"]))
        if self.params is None:
            self.build_model()
        self.params = jax.tree.map(jnp.asarray, params)
        self._initial_opt_state = restore
        return epoch

    # --------------------------------------------------------- persistence
    def save(self, path, model_name=None, **kwargs):
        if model_name is not None and model_name != self.model_name:
            self.model_name = model_name
        save_hyper_params(path, self)
        save_params(path, self)
        save_default_recs(path, self)
        trainer = getattr(self, "trainer", None)
        if trainer is not None and getattr(trainer, "opt_state", None) is not None:
            from ..utils.save_load import save_opt_state

            save_opt_state(path, self.model_name, trainer.opt_state)
        self.data_info.save(path, self.model_name)

    @classmethod
    def load(cls, path, model_name, data_info=None, **kwargs):
        from ..data.data_info import DataInfo

        if data_info is None:
            data_info = DataInfo.load(path, model_name)
        hparams = load_hyper_params(path, model_name)
        hparams.pop("model_class", None)
        model = cls(data_info=data_info, **hparams)
        model.model_name = model_name
        model.params = load_params(path, model_name)
        model.default_recs = load_default_recs(path, model_name)
        model.loaded = True
        model.post_load()
        return model

    def post_load(self):
        """Rebuild cached inference state after load."""
        self.post_fit_from_params()

    def post_fit_from_params(self):
        """Default: reuse post_fit-style finalization without recomputing
        default recs (they were persisted)."""
        self.post_epoch()
