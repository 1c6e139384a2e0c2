"""Micro-bench of the DIN jitted train step (value_and_grad + adam) and
ablations, on synthetic epoch-array batches — isolates the compute story
from the data pipeline. Timing-integrity: varied batch rows per rep +
forced loss readback.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def time_step(step, params, opt_state, make_batch, reps=12):
    out = step(params, opt_state, make_batch(0))
    jax.block_until_ready(out)
    times = []
    for r in range(1, reps + 1):
        b = make_batch(r)
        jax.block_until_ready(b)
        t0 = time.perf_counter()
        params2, opt2, loss = step(params, opt_state, b)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import pandas as pd
    from librecommender_tpu.data import DatasetFeat
    from librecommender_tpu.models import DIN

    N_USERS, N_ITEMS, N_ROWS, B = 6040, 3706, 200_000, 8192
    rng = np.random.default_rng(0)
    frame = pd.DataFrame({
        "user": rng.integers(0, N_USERS, N_ROWS),
        "item": rng.integers(0, N_ITEMS, N_ROWS),
        "label": np.ones(N_ROWS),
    }).drop_duplicates(subset=["user", "item"])
    sex = rng.choice(["m", "f"], N_USERS)
    genre = rng.choice(list("abcdefg"), N_ITEMS)
    frame["sex"] = sex[frame.user]
    frame["age"] = rng.normal(size=len(frame))
    frame["genre"] = genre[frame.item]
    train_data, data_info = DatasetFeat.build_trainset(
        frame, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )
    model = DIN("ranking", data_info, embed_size=64, n_epochs=1, lr=0.001,
                batch_size=B, recent_num=10, hidden_units=(128, 64, 32))
    model.build_model()
    extras = model.batch_extras(train_data)

    opt = optax.adam(1e-3, eps=1e-5)
    opt_state = opt.init(model.params)
    loss_fn = model.loss_fn

    def make_batch(r):
        rg = np.random.default_rng(r)
        rows = rg.integers(0, len(train_data), B)
        batch = {
            "user": jnp.asarray(train_data.user_indices[rows]),
            "item": jnp.asarray(train_data.item_indices[rows]),
            "label": jnp.ones((B,), jnp.float32),
            "weight": jnp.ones((B,), jnp.float32),
            "item_neg": jnp.asarray(rg.integers(0, N_ITEMS, (B, 1), np.int64).astype(np.int32)),
        }
        for k, v in (extras or {}).items():
            batch[k] = jnp.asarray(np.asarray(v)[rows])
        return batch

    STEPS = 32

    @jax.jit
    def scan_steps(params, opt_state, big_batch):
        def body(carry, i):
            params, opt_state = carry
            batch = {k: v[i] for k, v in big_batch.items()}
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(STEPS)
        )
        return params, opt_state, jnp.sum(losses)

    def make_big(r):
        batches = [make_batch(r * STEPS + i) for i in range(STEPS)]
        return {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

    def run(label):
        scan_steps.clear_cache()
        t = time_step(scan_steps, model.params, opt_state, make_big, reps=6)
        per = t / STEPS
        print(f"{label:16s} {per*1e3:7.3f} ms   {B/per/1e6:6.2f} M ex/s")

    run("full step")

    import librecommender_tpu.models.din as din_mod
    orig = din_mod.din_attention

    def mean_pool(params, queries, keys, mask):
        w = mask.astype(keys.dtype)
        w = w / jnp.maximum(w.sum(1, keepdims=True), 1.0)
        out = jnp.einsum("bl,bld->bd", w, keys)
        if queries.ndim == 3:                       # (T, B, D) shared-seq form
            out = jnp.broadcast_to(out[None], queries.shape)
        return out

    din_mod.din_attention = mean_pool
    run("mean-pool (no att)")
    din_mod.din_attention = orig

    # --- where does the time actually go? strip the step progressively ---
    @jax.jit
    def scan_fwd(params, opt_state, big_batch):
        def body(carry, i):
            batch = {k: v[i] for k, v in big_batch.items()}
            loss = loss_fn(carry, batch, jax.random.PRNGKey(0))
            return carry, loss
        params, losses = jax.lax.scan(body, params, jnp.arange(STEPS))
        return params, opt_state, jnp.sum(losses)

    @jax.jit
    def scan_grad(params, opt_state, big_batch):
        def body(carry, i):
            batch = {k: v[i] for k, v in big_batch.items()}
            loss, grads = jax.value_and_grad(loss_fn)(
                carry, batch, jax.random.PRNGKey(0)
            )
            # consume grads without optimizer
            carry = jax.tree.map(lambda p, g: p - 0.0 * g, carry, grads)
            return carry, loss
        params, losses = jax.lax.scan(body, params, jnp.arange(STEPS))
        return params, opt_state, jnp.sum(losses)

    @jax.jit
    def scan_update_only(params, opt_state, big_batch):
        def body(carry, i):
            params, opt_state = carry
            grads = jax.tree.map(jnp.zeros_like, params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), 0.0
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(STEPS)
        )
        return params, opt_state, jnp.sum(losses)

    for label, fn in (("forward only", scan_fwd),
                      ("grad, no optim", scan_grad),
                      ("optim only", scan_update_only)):
        t = time_step(fn, model.params, opt_state, make_big, reps=6)
        per = t / STEPS
        print(f"{label:16s} {per*1e3:7.3f} ms   {B/per/1e6:6.2f} M ex/s")


if __name__ == "__main__":
    main()
