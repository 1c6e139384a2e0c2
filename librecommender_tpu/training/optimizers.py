"""Custom optax transforms.

FTRL-Proximal (McMahan et al. 2013) for the WideDeep wide part — the
reference uses tf.train.FtrlOptimizer (libreco/training/tf_trainer.py:275);
optax ships no FTRL, so this implements the standard z/n accumulator update
with L1/L2 shrinkage as a GradientTransformation.
"""
import jax.numpy as jnp
import optax


def ftrl(learning_rate, learning_rate_power=-0.5, l1=0.0, l2=0.0, beta=0.0):
    def init_fn(params):
        import jax

        z = jax.tree.map(jnp.zeros_like, params)
        n = jax.tree.map(jnp.zeros_like, params)
        return {"z": z, "n": n}

    def update_fn(grads, state, params):
        import jax

        def per_leaf(g, z, n, w):
            n_new = n + jnp.square(g)
            sigma = (n_new ** -learning_rate_power - n ** -learning_rate_power) / learning_rate
            z_new = z + g - sigma * w
            # closed-form proximal step
            denom = (beta + jnp.sqrt(n_new)) / learning_rate + l2
            w_new = jnp.where(
                jnp.abs(z_new) <= l1,
                0.0,
                -(z_new - jnp.sign(z_new) * l1) / denom,
            )
            return w_new - w, z_new, n_new

        flat_out = jax.tree.map(per_leaf, grads, state["z"], state["n"], params)

        def pick(i):
            # pass through MaskedNode leaves injected by optax.multi_transform
            # (MaskedNode is an *empty NamedTuple*, hence the strict type check)
            return lambda t: t[i] if type(t) is tuple else t

        is_leaf = lambda t: type(t) is tuple or not hasattr(t, "__len__")  # noqa: E731
        updates = jax.tree.map(pick(0), flat_out, is_leaf=is_leaf)
        z = jax.tree.map(pick(1), flat_out, is_leaf=is_leaf)
        n = jax.tree.map(pick(2), flat_out, is_leaf=is_leaf)
        return updates, {"z": z, "n": n}

    return optax.GradientTransformation(init_fn, update_fn)
