"""Lazy (row-sparse) Adam for embedding tables.

The default dense optax update is bandwidth-optimal when tables are small
relative to the batch's touched rows (ML-1M scale: the full-table update IS
the HBM roofline). For production vocabularies (multi-million rows), the
dense update reads+writes every row of params/mu/nu each step while a batch
touches only ~batch_size*3 rows. This module updates ONLY touched rows:
gather grad/mu/nu rows, apply Adam with global-step bias correction
(standard LazyAdam semantics: momentum of untouched rows is frozen, not
decayed), scatter back.

Duplicate indices are safe without dedup: the dense autodiff gradient
already sums duplicate contributions per row, so every duplicate entry
computes the IDENTICAL new row value and scattering with `.set` writes the
same bytes.
"""
import jax.numpy as jnp


def init_table_state(params, table_keys):
    return {
        "mu": {k: jnp.zeros_like(params[k]) for k in table_keys},
        "nu": {k: jnp.zeros_like(params[k]) for k in table_keys},
        "count": jnp.zeros((), jnp.int32),
    }


def lazy_adam_update(params, grads, state, touched, lr, b1=0.9, b2=0.999,
                     eps=1e-5):
    """Apply row-sparse Adam to ``touched`` = {table_key: (R,) indices}.

    Returns (new_params_for_tables, new_state). Tables are top-level keys.
    """
    count = state["count"] + 1
    tc = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** tc
    bc2 = 1.0 - b2 ** tc
    new_params = {}
    new_mu, new_nu = dict(state["mu"]), dict(state["nu"])
    for key, idx in touched.items():
        g = grads[key][idx]                                  # (R, ...) rows
        mu_rows = state["mu"][key][idx]
        nu_rows = state["nu"][key][idx]
        mu_new = b1 * mu_rows + (1.0 - b1) * g
        nu_new = b2 * nu_rows + (1.0 - b2) * jnp.square(g)
        step = lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
        new_params[key] = params[key].at[idx].set(params[key][idx] - step)
        new_mu[key] = state["mu"][key].at[idx].set(mu_new)
        new_nu[key] = state["nu"][key].at[idx].set(nu_new)
    return new_params, {"mu": new_mu, "nu": new_nu, "count": count}


# per-step cost of the row path: ~7 index rows' worth of gathers/scatters
# per touched row (g/mu/nu/param reads + param/mu/nu writes) at the TPU's
# per-row floor. Below this table size a full dense pass is cheaper —
# profiled on v5e the row machinery is ~60% of the BPR step while a dense
# masked pass over a 6k-row table is ~16 us of pure bandwidth.
DENSE_UPDATE_MAX_ROWS = 65536


def dense_masked_adam_update(params, grads, state, table_keys, lr,
                             b1=0.9, b2=0.999, eps=1e-5):
    """LazyAdam over small tables with NO gathers or scatters: the dense
    autodiff gradient already carries zero rows for untouched ids, so the
    touched set is ``any(|grad_row|) > 0`` and the whole update is masked
    full-table elementwise arithmetic (bandwidth-bound, vectorized).

    Semantics match :func:`lazy_adam_update` except for the measure-zero
    case of a touched row whose gradient is EXACTLY zero in every column
    (the row path would decay its momentum; this path freezes it).
    """
    count = state["count"] + 1
    tc = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** tc
    bc2 = 1.0 - b2 ** tc
    new_params = {}
    new_mu, new_nu = dict(state["mu"]), dict(state["nu"])
    for key in table_keys:
        g = grads[key]                                     # (R, D) dense
        mask = jnp.any(g != 0.0, axis=-1, keepdims=True)   # (R, 1)
        mu_new = b1 * state["mu"][key] + (1.0 - b1) * g
        nu_new = b2 * state["nu"][key] + (1.0 - b2) * jnp.square(g)
        step = lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
        new_params[key] = jnp.where(mask, params[key] - step, params[key])
        new_mu[key] = jnp.where(mask, mu_new, state["mu"][key])
        new_nu[key] = jnp.where(mask, nu_new, state["nu"][key])
    return new_params, {"mu": new_mu, "nu": new_nu, "count": count}
