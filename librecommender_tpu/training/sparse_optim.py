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
