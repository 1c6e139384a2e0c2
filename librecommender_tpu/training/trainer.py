"""The single functional training core.

Replaces all three reference trainers (libreco/training/tf_trainer.py:13,133,
248 and torch_trainer.py:27,164) with one jitted train step over pytree
params + optax state. Per-model behavior enters through ``model.loss_fn`` (a
pure function of (params, batch, rng)); everything else — optimizer, LR
schedule, device-side negative sampling, epoch loop, per-epoch eval — is
shared.

TPU notes: the step is compiled exactly once (static batch shapes come from
the BatchGenerator's padding); params/opt_state are donated so updates are
in-place in HBM; `sampler="random"` negatives are drawn inside the step from
a threefry key derived from (seed, step) so sampling is reproducible and
free of host round-trips.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation.evaluate import print_metrics
from ..utils.misc import colorize, time_block


def make_optimizer(lr, lr_decay, epsilon, n_batches_per_epoch, n_epochs,
                   lr_schedule="exponential"):
    """Adam with optional LR decay.

    Reference: Adam(eps=1e-5) + exponential decay (tfops/configs.py:38) for
    TF models, CosineAnnealingWarmRestarts (torch_trainer.py:27) for torch
    models; both are offered here.
    """
    if lr_decay:
        if lr_schedule == "cosine":
            schedule = optax.cosine_decay_schedule(
                lr, decay_steps=max(1, n_batches_per_epoch * n_epochs)
            )
        else:
            schedule = optax.exponential_decay(
                lr,
                transition_steps=max(1, n_batches_per_epoch),
                decay_rate=0.96,
                staircase=True,
            )
    else:
        schedule = lr
    return optax.adam(schedule, eps=epsilon)


class Trainer:
    def __init__(
        self,
        model,
        n_epochs,
        lr,
        lr_decay,
        epsilon,
        batch_size,
        sampler,
        num_neg,
        lr_schedule="exponential",
        optimizer=None,
        mesh=None,
    ):
        self.model = model
        self.mesh = mesh
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        self.lr_schedule = lr_schedule
        self.optimizer = optimizer
        self._train_step = None

    def _build_train_step(self, optimizer, device_side_sampling, n_items, num_neg):
        loss_fn = self.model.loss_fn

        def step(params, opt_state, batch, rng):
            if device_side_sampling:
                rng, k1, k2 = jax.random.split(rng, 3)
                shape = (batch["item"].shape[0], num_neg)
                neg = jax.random.randint(k1, shape, 0, n_items, dtype=jnp.int32)
                resample = jax.random.randint(k2, shape, 0, n_items, dtype=jnp.int32)
                # one rejection round against the paired positive
                neg = jnp.where(neg == batch["item"][:, None], resample, neg)
                batch = dict(batch, item_neg=neg)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0, 1))

        from ..parallel.mesh import batch_shardings, params_shardings
        from jax.sharding import NamedSharding, PartitionSpec as P

        p_shard = params_shardings(self.model.params, self.mesh)
        data_shard = NamedSharding(self.mesh, P("data"))

        def batch_in_shardings(batch):
            return {k: data_shard for k in batch}

        self._p_shard = p_shard
        self._data_shard = data_shard
        # in_shardings for batch are resolved lazily at first call (the key
        # set varies by paradigm); jit once per key set
        self._sharded_steps = {}

        def sharded_step(params, opt_state, batch, rng):
            key = tuple(sorted(batch))
            if key not in self._sharded_steps:
                self._sharded_steps[key] = jax.jit(
                    step,
                    in_shardings=(
                        p_shard, None, {k: data_shard for k in batch}, None
                    ),
                    out_shardings=(p_shard, None, None),
                    donate_argnums=(0, 1),
                )
            return self._sharded_steps[key](params, opt_state, batch, rng)

        return sharded_step

    def run(
        self,
        train_data,
        neg_sampling,
        verbose,
        shuffle,
        eval_data,
        metrics,
        k=10,
        eval_batch_size=8192,
        eval_user_num=None,
        **kwargs,
    ):
        from ..batch import BatchGenerator

        model = self.model
        generator = BatchGenerator(
            train_data,
            model.data_info,
            self.batch_size,
            paradigm=model.paradigm,
            neg_sampling=neg_sampling,
            sampler=self.sampler,
            num_neg=self.num_neg,
            seed=model.seed,
            extras=getattr(model, "batch_extras", lambda d: None)(train_data),
        )
        n_batches = generator.n_batches()
        optimizer = self.optimizer or make_optimizer(
            self.lr, self.lr_decay, self.epsilon, n_batches, self.n_epochs,
            self.lr_schedule,
        )
        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            dp = self.mesh.shape["data"]
            assert self.batch_size % dp == 0, (
                f"batch_size {self.batch_size} must divide by data-parallel "
                f"size {dp}"
            )
            model.params = shard_params(model.params, self.mesh)
        params = model.params
        opt_state = optimizer.init(params)
        initial = getattr(model, "_initial_opt_state", None)
        if initial is not None:
            from .rebuild import graft_opt_state

            kind, old_opt = initial
            opt_state = graft_opt_state(old_opt, opt_state, params, model.data_info)
            model._initial_opt_state = None
        train_step = self._build_train_step(
            optimizer,
            generator.device_side_sampling,
            model.n_items,
            self.num_neg,
        )
        self._optimizer = optimizer

        base_rng = jax.random.PRNGKey(model.seed)
        step_idx = 0
        for epoch in range(1, self.n_epochs + 1):
            if verbose > 0 and self.lr_decay:
                print(f"With lr_decay, epoch {epoch} start...")
            with time_block(f"Epoch {epoch}", verbose):
                losses = []
                for batch in generator(shuffle=shuffle):
                    rng = jax.random.fold_in(base_rng, step_idx)
                    params, opt_state, loss = train_step(params, opt_state, batch, rng)
                    losses.append(loss)
                    step_idx += 1
                if verbose > 0:
                    epoch_loss = float(np.mean(jax.device_get(jnp.stack(losses))))
                    print(f"\t train_loss: {epoch_loss:.4f}")

            if verbose > 1:
                model.params = params
                model.post_epoch()
                print_metrics(
                    model,
                    eval_data=eval_data,
                    metrics=metrics,
                    eval_batch_size=eval_batch_size,
                    k=k,
                    sample_user_num=eval_user_num,
                    seed=model.seed,
                    neg_sampling=neg_sampling,
                )
                print("=" * 30)

        model.params = params
        self.opt_state = opt_state
