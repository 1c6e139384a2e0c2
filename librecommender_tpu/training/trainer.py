"""The single functional training core.

Replaces all three reference trainers (libreco/training/tf_trainer.py:13,133,
248 and torch_trainer.py:27,164) with one jitted train step over pytree
params + optax state. Per-model behavior enters through ``model.loss_fn`` (a
pure function of (params, batch, rng)); everything else — optimizer, LR
schedule, device-side negative sampling, epoch loop, per-epoch eval — is
shared.

TPU notes: the whole epoch is ONE jitted `lax.scan` over batches — the
epoch's row-aligned index arrays are uploaded to HBM once per fit, each scan
step gathers its batch through a device-side permutation, negatives
(sampler="random") are drawn in-kernel from a threefry key derived from
(seed, epoch, step), and params/opt_state are donated so updates are
in-place. The host dispatches one program per epoch; measured BPR
throughput on one v5e chip is ~8.1M examples/s (per-epoch timing forces
a device->host readback — see PARITY.md timing-integrity note). Under a mesh the same scan runs
with params row-sharded over `model` and epoch data sharded over `data`.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation.evaluate import print_metrics
from ..utils.misc import colorize, time_block


def make_optimizer(lr, lr_decay, epsilon, n_batches_per_epoch, n_epochs,
                   lr_schedule="exponential", amsgrad=False):
    """Adam with optional LR decay.

    Reference: Adam(eps=1e-5) + exponential decay (tfops/configs.py:38) for
    TF models, CosineAnnealingWarmRestarts (torch_trainer.py:27) for torch
    models; both are offered here. ``amsgrad`` matches the torch graph
    family's option (torch Adam(amsgrad=...), configured in
    libreco/training/torch_trainer.py).
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
    if amsgrad:
        return optax.amsgrad(schedule, eps=epsilon)
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
        from ..batch import adjust_batch_size

        self.model = model
        self.mesh = mesh
        # pallas table-lookup kernels (ops/mxu_gather.py) don't carry GSPMD
        # sharding rules; models consult this to fall back under a mesh
        model._under_mesh = mesh is not None
        if hasattr(model, "_mxu_lookup"):
            import jax

            # training-time MXU lookups for small-vocab tables (the
            # per-table size gate lives in FeatBase._train_lookup);
            # _mxu_lookup_force overrides for tests (interpret mode)
            force = getattr(model, "_mxu_lookup_force", None)
            model._mxu_lookup = force if force is not None else (
                mesh is None and jax.default_backend() == "tpu"
            )
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        # reference semantics: batch_size counts TOTAL examples per step,
        # negatives/walk expansion included (libreco/training/trainer.py:28)
        self.batch_size = adjust_batch_size(model, batch_size)
        self.sampler = sampler
        self.num_neg = num_neg
        self.lr_schedule = lr_schedule
        self.optimizer = optimizer
        self._train_step = None

    @staticmethod
    def _pack_epoch_arrays(epoch_host):
        """Pack the per-row epoch arrays into ONE int32 matrix and ONE f32
        matrix (N, cols). Profiling showed per-step batch assembly paying
        the TPU gather cost PER ARRAY (~7ns/index-row regardless of width,
        so a (B,) label gather costs as much as a (B, 64) embedding
        gather); gathering two wide matrices instead of k narrow arrays
        removes k-2 gathers from every step. Returns (packed dict,
        layout dict of key -> ("ints"|"flts", start, ncols, orig_shape))."""
        layout, int_cols, flt_cols = {}, [], []
        for k, v in epoch_host.items():
            v = np.asarray(v)
            cols = v.reshape(v.shape[0], -1)
            if np.issubdtype(v.dtype, np.integer):
                layout[k] = ("ints", sum(c.shape[1] for c in int_cols),
                             cols.shape[1], v.shape[1:])
                int_cols.append(cols.astype(np.int32))
            else:
                layout[k] = ("flts", sum(c.shape[1] for c in flt_cols),
                             cols.shape[1], v.shape[1:])
                flt_cols.append(cols.astype(np.float32))
        packed = {}
        if int_cols:
            packed["ints"] = np.concatenate(int_cols, axis=1)
        if flt_cols:
            packed["flts"] = np.concatenate(flt_cols, axis=1)
        return packed, layout

    def _build_epoch_fn(self, optimizer, device_side_sampling, n_items,
                        num_neg, n_batches, batch_size, has_host_negs,
                        shuffle=True, n_rows=0):
        """One jitted `lax.scan` over all batches of an epoch.

        The epoch's row-aligned arrays live in HBM; each scan step gathers
        its batch rows through a device-side permutation, samples negatives
        in-kernel (sampler="random"), and applies the optax update — the
        host dispatches ONE program per epoch instead of one per step.

        When the model opts into ``sparse_optimizer`` (huge vocab tables),
        its ``sparse_tables`` leaves update through row-sparse LazyAdam
        (training/sparse_optim.py) while the rest keep the dense optimizer.
        """
        loss_fn = self.model.loss_fn
        sparse_tables = ()
        if getattr(self.model, "sparse_optimizer", False):
            # composes with the mesh: tables (and their mu/nu) row-shard over
            # `model`, the LazyAdam row gather/scatter lowers to GSPMD
            # collectives like any other sharded gather (SURVEY §2.7 mandate)
            sparse_tables = tuple(getattr(self.model, "sparse_tables", ()))
        touched_fn = getattr(self.model, "touched_indices", None)
        # dict lr (WideDeep-style per-part) has no principled sparse-table
        # rate; fall back to 1e-3 (now actually reachable — the raw lr is
        # passed through to the Trainer since round 2)
        sparse_lr = self.lr if not isinstance(self.lr, dict) else 1e-3
        # LazyAdam flavor: small tables take the dense masked pass (no
        # gathers/scatters — profiled ~60% of the BPR step was the row
        # machinery); huge vocabularies keep the row path. "auto"/"rows"/
        # "dense" via model.sparse_update_mode.
        dense_tables = False
        if sparse_tables:
            from .sparse_optim import DENSE_UPDATE_MAX_ROWS

            mode = getattr(self.model, "sparse_update_mode", "auto")
            if mode == "dense":
                dense_tables = True
            elif mode == "auto":
                # composes with the mesh: the masked pass is elementwise
                # over row-sharded tables (no cross-shard traffic at all)
                dense_tables = all(
                    self.model.params[k].shape[0] <= DENSE_UPDATE_MAX_ROWS
                    for k in sparse_tables
                )

        layout = self._epoch_layout

        # --- touched-row gradient compaction over the cross-process axis ---
        # Under a mesh whose `data` axis spans processes, XLA's implicit
        # grad all-reduce ships every table's FULL dense gradient each step
        # (measured 2.5 MB/step at bench_multiproc shapes — dominant on
        # DCN-class links, PARITY.md weak-scaling table). When the batch
        # touches far fewer rows than the table holds, ship the touched
        # rows instead: a shard_map manual over `data` (model axis stays
        # GSPMD-auto) computes LOCAL grads, gathers each table's touched
        # row-grads, all-gathers the compacted (ids, rows) payload, and
        # rebuilds the replicated dense gradient by local scatter-add —
        # payload O(touched x D) instead of O(rows x D), with everything
        # downstream (dense/lazy/masked Adam) unchanged.
        # model.grad_compaction: "auto" (compact any table with fewer
        # touched ids than rows) | True (always) | False (off).
        compaction = getattr(self.model, "grad_compaction", "auto")
        data_span = (
            self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        )
        # listwise losses couple examples ACROSS the batch (in-batch /
        # sampled softmax denominators); a per-shard grad does not
        # decompose, so those families keep the dense GSPMD all-reduce
        listwise_loss = getattr(self.model, "loss_type", "") in (
            "softmax", "sampled_softmax", "nce",
        )
        use_compaction = (
            compaction is not False
            and data_span > 1
            and touched_fn is not None
            and not listwise_loss
        )
        mesh = self.mesh

        def _compacted_value_and_grad(params, batch, rng):
            from jax.sharding import PartitionSpec as PSpec

            def local_grads(params, batch, rng):
                # per-example randomness must differ per data shard; the
                # global-program stream would have drawn one (B_global,...)
                # mask — fold the shard index so shards decorrelate
                # (bit-identical to the unsharded run for rng-free losses)
                rng_l = jax.random.fold_in(
                    rng, jax.lax.axis_index("data")
                )
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, batch, rng_l
                )
                # every loss is a WEIGHTED mean over its examples (pad
                # rows carry weight 0 on the epoch's final batch), so the
                # shards' divisors are unequal there: recombine local
                # grads as psum(g_p * W_p/W_global), which equals the
                # global weighted-mean gradient exactly — and reduces to
                # an exact *1/P on full batches (powers of two)
                w_local = (
                    jnp.sum(batch["weight"]) if "weight" in batch
                    else jnp.float32(1.0)
                )
                w_global = jax.lax.psum(w_local, "data")
                factor = w_local / w_global
                touched = {
                    k: v.reshape(-1)
                    for k, v in touched_fn(batch).items()
                    if k in grads
                    and (
                        compaction is True
                        or v.size * data_span < grads[k].shape[0]
                    )
                }
                for k, ids in touched.items():
                    # the local dense grad has already SUMMED duplicate
                    # ids; dedup before gathering rows or the scatter
                    # re-counts each duplicate. Fixed-capacity unique
                    # (jit-static); pad slots get an out-of-range id the
                    # scatter drops (and whose clamped gather is inert)
                    n_rows_k = grads[k].shape[0]
                    uids = jnp.unique(
                        ids, size=ids.shape[0], fill_value=n_rows_k
                    )
                    rows_g = grads[k][
                        jnp.minimum(uids, n_rows_k - 1)
                    ] * factor
                    gids = jax.lax.all_gather(uids, "data", tiled=True)
                    grows = jax.lax.all_gather(rows_g, "data", tiled=True)
                    grads[k] = (
                        jnp.zeros_like(grads[k])
                        .at[gids]
                        .add(grows, mode="drop")
                    )
                rest = {k: g for k, g in grads.items() if k not in touched}
                rest = jax.lax.psum(
                    jax.tree.map(lambda g: g * factor, rest), "data"
                )
                loss = jax.lax.psum(loss * factor, "data")
                return loss, {**rest, **{k: grads[k] for k in touched}}

            return jax.shard_map(
                local_grads,
                mesh=mesh,
                in_specs=(PSpec(), {k: PSpec("data") for k in batch},
                          PSpec()),
                out_specs=(PSpec(), PSpec()),
                axis_names={"data"},
                check_vma=False,
            )(params, batch, rng)

        def epoch_fn(params, opt_state, data, host_negs, perm_rng, base_rng):
            # the shuffle permutation is drawn INSIDE the jitted program:
            # a separate host-dispatched permutation costs one extra
            # device round-trip per epoch (~40 ms over the remote tunnel,
            # comparable to the whole epoch's device time at BPR scale)
            perm = (
                jax.random.permutation(perm_rng, n_rows)
                if shuffle
                else jnp.arange(n_rows)
            ).astype(jnp.int32)

            def body(carry, idx):
                params, opt_state = carry
                rows = jax.lax.dynamic_slice(
                    perm, (idx * batch_size,), (batch_size,)
                )
                packed = {k: v[rows] for k, v in data.items()}
                batch = {}
                for k, (mat, start, ncols, tail) in layout.items():
                    cols = packed[mat][:, start:start + ncols]
                    batch[k] = (
                        cols.reshape((batch_size,) + tail) if tail
                        else cols[:, 0]
                    )
                rng = jax.random.fold_in(base_rng, idx)
                if device_side_sampling:
                    # rejection-style resampling against the batch positive,
                    # matching the reference's tolerance loop
                    # (libreco/sampling/negatives.py:17, tolerance=10) —
                    # unrolled draws, each replacing remaining collisions
                    rng, k1 = jax.random.split(rng)
                    shape = (batch_size, num_neg)
                    neg = jax.random.randint(k1, shape, 0, n_items, jnp.int32)
                    pos = batch["item"][:, None]
                    for t in range(4):
                        rng, kt = jax.random.split(rng)
                        redraw = jax.random.randint(
                            kt, shape, 0, n_items, jnp.int32
                        )
                        neg = jnp.where(neg == pos, redraw, neg)
                    batch["item_neg"] = neg
                elif has_host_negs:
                    batch["item_neg"] = host_negs[rows]
                if use_compaction:
                    loss, grads = _compacted_value_and_grad(
                        params, batch, rng
                    )
                else:
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params, batch, rng
                    )
                if sparse_tables:
                    from .sparse_optim import (
                        dense_masked_adam_update,
                        lazy_adam_update,
                    )

                    opt_rest, table_state = opt_state
                    if dense_tables:
                        table_params, table_state = dense_masked_adam_update(
                            params, grads, table_state, sparse_tables,
                            sparse_lr, eps=self.epsilon,
                        )
                    else:
                        touched = {
                            k: v for k, v in touched_fn(batch).items()
                            if k in sparse_tables
                        }
                        table_params, table_state = lazy_adam_update(
                            params, grads, table_state, touched, sparse_lr,
                            eps=self.epsilon,
                        )
                    rest_params = {
                        k: v for k, v in params.items() if k not in sparse_tables
                    }
                    rest_grads = {
                        k: v for k, v in grads.items() if k not in sparse_tables
                    }
                    updates, opt_rest = optimizer.update(
                        rest_grads, opt_rest, rest_params
                    )
                    rest_params = optax.apply_updates(rest_params, updates)
                    params = {**rest_params, **{
                        k: table_params.get(k, params[k]) for k in sparse_tables
                    }}
                    opt_state = (opt_rest, table_state)
                else:
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_batches)
            )
            return params, opt_state, losses

        if self.mesh is None:
            return jax.jit(epoch_fn, donate_argnums=(0, 1))

        # sharded epoch: params/tables per sharding rules, epoch data rows
        # over the data axis; the per-step gather reshards batches over ICI
        from ..parallel.mesh import params_shardings
        from jax.sharding import NamedSharding, PartitionSpec as P

        p_shard = params_shardings(self.model.params, self.mesh)
        data_shard = NamedSharding(self.mesh, P("data"))

        return jax.jit(
            epoch_fn,
            in_shardings=(
                p_shard, None,
                {k: data_shard for k in self._epoch_data_keys},
                None, None, None,
            ),
            out_shardings=(p_shard, None, None),
            donate_argnums=(0, 1),
        )

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
        profile_dir=None,
        checkpoint_dir=None,
        checkpoint_every=1,
        early_stopping=None,
        **kwargs,
    ):
        from ..batch import BatchGenerator

        if early_stopping:
            if eval_data is None:
                raise ValueError("early_stopping requires eval_data")
            es_metric = (metrics or ["loss"])[0]
            # lower-is-better metrics; everything else (auc, ndcg, ...) is
            # higher-is-better
            es_lower = es_metric in ("loss", "rmse", "mae", "log_loss")
            es_best, es_best_params, es_bad = None, None, 0

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
        if self.optimizer is not None:
            optimizer = self.optimizer
        else:
            if isinstance(self.lr, dict):
                raise ValueError(
                    "a dict `lr` requires a model-supplied optimizer "
                    "(_custom_optimizer), e.g. WideDeep's FTRL+Adam"
                )
            optimizer = make_optimizer(
                self.lr, self.lr_decay, self.epsilon, n_batches,
                self.n_epochs, self.lr_schedule,
                amsgrad=getattr(self.model, "amsgrad", False),
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
        if getattr(model, "sparse_optimizer", False):
            from .sparse_optim import init_table_state

            tables = tuple(getattr(model, "sparse_tables", ()))
            rest = {k: v for k, v in params.items() if k not in tables}
            # zeros_like inherits the tables' mesh sharding, so mu/nu
            # row-shard exactly like their params under a mesh
            opt_state = (optimizer.init(rest), init_table_state(params, tables))
        else:
            opt_state = optimizer.init(params)
        initial = getattr(model, "_initial_opt_state", None)
        if initial is not None:
            kind, payload = initial
            # payload is ("leaves", [arrays]) from the npz format or
            # ("pytree", obj) from legacy pickle saves
            fmt, old_opt = payload
            if fmt == "leaves":
                from ..utils.save_load import restore_opt_leaves

                old_opt = restore_opt_leaves(opt_state, old_opt)
            if kind == "restore":  # same-shape checkpoint resume
                opt_state = jax.tree.map(jnp.asarray, old_opt)
            else:  # "graft": enlarged-vocab retrain
                from .rebuild import graft_opt_state

                opt_state = graft_opt_state(
                    old_opt, opt_state, params, model.data_info
                )
            model._initial_opt_state = None
        self._optimizer = optimizer

        # NOTE (measured dead end): eliding the label/weight float gather
        # for pairwise models (both derivable from the row index) LOSES
        # 2.5x on the BPR bench (12.3M -> 4.9M ex/s) — removing the float
        # matrix changes XLA's epoch-scan schedule for the worse. Keep the
        # gather.
        epoch_host, self._epoch_layout = self._pack_epoch_arrays(
            generator.epoch_arrays()
        )
        self._epoch_data_keys = list(epoch_host)
        n_rows = generator.n_batches() * self.batch_size
        epoch_fn = self._build_epoch_fn(
            optimizer,
            generator.device_side_sampling,
            model.n_items,
            self.num_neg,
            generator.n_batches(),
            self.batch_size,
            has_host_negs=generator.has_host_negatives,
            shuffle=shuffle,
            n_rows=n_rows,
        )
        if self.mesh is None:
            data_dev = {k: jnp.asarray(v) for k, v in epoch_host.items()}
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_shard = NamedSharding(self.mesh, P("data"))
            data_dev = {
                k: jax.device_put(v, data_shard) for k, v in epoch_host.items()
            }

        base_rng = jax.random.PRNGKey(model.seed)
        self.epoch_times = []  # wall-clock per epoch (first includes compile)
        for epoch in range(1, self.n_epochs + 1):
            if verbose > 0 and self.lr_decay:
                print(f"With lr_decay, epoch {epoch} start...")
            epoch_start = time.perf_counter()
            with time_block(f"Epoch {epoch}", verbose):
                epoch_rng = jax.random.fold_in(base_rng, 1_000_000 + epoch)
                host_negs = generator.epoch_negatives()
                host_negs = (
                    jnp.asarray(host_negs)
                    if host_negs is not None
                    else jnp.zeros((), jnp.int32)
                )
                # profile the first post-compile epoch (xplane trace for
                # tensorboard / xprof; reference had only wall-clock timing)
                do_profile = profile_dir is not None and epoch == 2
                if do_profile:
                    jax.profiler.start_trace(profile_dir)
                params, opt_state, losses = epoch_fn(
                    params, opt_state, data_dev, host_negs, epoch_rng,
                    jax.random.fold_in(base_rng, epoch),
                )
                # force a device->host readback: on some remote backends
                # block_until_ready returns before execution completes
                _ = float(jnp.max(losses))
                if do_profile:
                    jax.profiler.stop_trace()
                    if verbose > 0:
                        print(colorize(f"profile written to {profile_dir}", "cyan"))
                self.epoch_times.append(time.perf_counter() - epoch_start)
                if verbose > 0:
                    print(f"\t train_loss: {float(jnp.mean(losses)):.4f}")

            if checkpoint_dir is not None and epoch % checkpoint_every == 0:
                # periodic mid-training checkpoint (params + opt state); the
                # reference had none (SURVEY §5 failure-recovery gap).
                # npz (not pickle) so resume is safe on untrusted dirs.
                from pathlib import Path

                from ..utils.save_load import flatten_tree

                ckpt = Path(checkpoint_dir)
                ckpt.mkdir(parents=True, exist_ok=True)
                arrays = {"epoch": np.asarray(epoch)}
                for k, v in flatten_tree(jax.device_get(params)).items():
                    arrays[f"p:{k}"] = np.asarray(v)
                for i, leaf in enumerate(
                    jax.tree_util.tree_leaves(jax.device_get(opt_state))
                ):
                    arrays[f"o:leaf_{i:05d}"] = np.asarray(leaf)
                np.savez(ckpt / "checkpoint.npz", **arrays)

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

            if early_stopping:
                from ..evaluation.evaluate import evaluate

                model.params = params
                model.post_epoch()
                val = evaluate(
                    model, eval_data, neg_sampling=neg_sampling,
                    metrics=[es_metric], k=k,
                    sample_user_num=eval_user_num, seed=model.seed,
                )[es_metric]
                improved = es_best is None or (
                    val < es_best if es_lower else val > es_best
                )
                if improved:
                    es_best, es_bad = val, 0
                    # params are DONATED into next epoch's program — keep a
                    # host snapshot to restore the best epoch's state
                    es_best_params = jax.device_get(params)
                else:
                    es_bad += 1
                    if es_bad >= early_stopping:
                        if verbose > 0:
                            print(colorize(
                                f"early stop at epoch {epoch}: {es_metric} "
                                f"best {es_best:.4f}, no improvement for "
                                f"{early_stopping} epochs", "cyan",
                            ))
                        params = jax.tree.map(jnp.asarray, es_best_params)
                        break

        if early_stopping and es_best_params is not None and es_bad < early_stopping:
            # trained to the last epoch: still keep the best-seen params
            params = jax.tree.map(jnp.asarray, es_best_params)

        model.params = params
        self.opt_state = opt_state
