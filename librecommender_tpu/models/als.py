"""ALS: alternating least squares matrix factorization on TPU.

Reference parity: libreco/algorithms/als.py:20 + _als.pyx:47,99,170 — the
Cython/LAPACK/OpenMP normal-equation and conjugate-gradient solvers become
**batched** on-device solves: users are bucketed by interaction count into
power-of-two padded groups; each bucket builds its (B, D, D) normal matrices
with one einsum over padded (id, weight) arrays and solves them with
`jnp.linalg.solve` (XLA batched Cholesky/LU on the MXU). Explicit task
solves the observed-entry least squares; implicit ("ranking") task uses the
Hu-Koren-Volinsky confidence weighting with the precomputed VtV trick.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..bases.embed_base import EmbedBase
from ..evaluation.evaluate import print_metrics
from ..ops.initializers import truncated_normal
from ..utils.misc import time_block
from ..utils.validate import check_fitting


def _bucketize(consumed, labels_map, n_rows, max_pow=None):
    """Group rows by ceil-pow2 padded interaction count.

    Returns list of (L, row_ids (B,), padded_ids (B, L), padded_w (B, L)).
    """
    buckets = {}
    for r in range(n_rows):
        items = consumed.get(r, [])
        n = len(items)
        if n == 0:
            continue
        L = 1 << (n - 1).bit_length()
        buckets.setdefault(L, []).append(r)
    out = []
    for L, rows in sorted(buckets.items()):
        ids = np.zeros((len(rows), L), np.int32)
        ws = np.zeros((len(rows), L), np.float32)
        for j, r in enumerate(rows):
            items = np.asarray(consumed[r], dtype=np.int64)
            vals = labels_map(r, items)
            ids[j, : len(items)] = items
            ws[j, : len(items)] = vals
        out.append((L, np.asarray(rows, np.int32), ids, ws))
    return out


class ALS(EmbedBase):
    def __init__(
        self,
        task,
        data_info,
        embed_size=16,
        n_epochs=10,
        reg=None,
        alpha=10,
        use_cg=True,  # accepted for API familiarity; solves are batched direct
        n_threads=1,
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        super().__init__(task, data_info, embed_size, lower_upper_bound, seed)
        self.n_epochs = n_epochs
        self.reg = reg if reg is not None else 0.01
        self.alpha = alpha
        self.params = None

    def build_model(self):
        rng = jax.random.PRNGKey(self.seed)
        r1, r2 = jax.random.split(rng)
        self.params = {
            "user_embed": truncated_normal(r1, (self.n_users, self.embed_size)),
            "item_embed": truncated_normal(r2, (self.n_items, self.embed_size)),
        }

    def loss_fn(self, params, batch, rng):  # pragma: no cover - not SGD-trained
        raise NotImplementedError("ALS trains by alternating solves")

    # --------------------------------------------------------------- solving
    def _make_solvers(self):
        D = self.embed_size
        reg_eye = self.reg * jnp.eye(D)
        implicit = self.task == "ranking"
        alpha = float(self.alpha)

        @jax.jit
        def solve_explicit(other_embed, ids, ws):
            V = other_embed[ids]                               # (B, L, D)
            mask = (ws != 0.0).astype(V.dtype)
            Vm = V * mask[:, :, None]
            A = jnp.einsum("bld,ble->bde", Vm, Vm) + reg_eye
            b = jnp.einsum("bld,bl->bd", Vm, ws)
            return jnp.linalg.solve(A, b[..., None])[..., 0]

        @jax.jit
        def solve_implicit(other_embed, VtV, ids, ws):
            V = other_embed[ids]
            mask = (ws != 0.0).astype(V.dtype)
            conf = alpha * ws * mask                            # c - 1
            A = VtV + jnp.einsum("bld,bl,ble->bde", V, conf, V) + reg_eye
            b = jnp.einsum("bld,bl->bd", V, (1.0 + conf) * mask)
            return jnp.linalg.solve(A, b[..., None])[..., 0]

        return solve_implicit if implicit else solve_explicit

    def _solve_side(self, solver, own_key, other_key, buckets):
        params = self.params
        other = params[other_key]
        if self.task == "ranking":
            VtV = other.T @ other
        own = np.array(params[own_key])  # writable host copy
        for L, rows, ids, ws in buckets:
            if self.task == "ranking":
                out = solver(other, VtV, jnp.asarray(ids), jnp.asarray(ws))
            else:
                out = solver(other, jnp.asarray(ids), jnp.asarray(ws))
            own[rows] = np.asarray(out)
        params[own_key] = jnp.asarray(own)

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
        **kwargs,
    ):
        check_fitting(self, train_data, eval_data, neg_sampling, k)
        if self.params is None:
            self.build_model()
        interaction = train_data.sparse_interaction

        def user_label(u, items):
            if self.task == "ranking":
                return np.ones(len(items), np.float32)
            return np.asarray(interaction[u, items].todense()).ravel()

        def item_label(i, users):
            if self.task == "ranking":
                return np.ones(len(users), np.float32)
            return np.asarray(interaction[users, i].todense()).ravel()

        user_buckets = _bucketize(
            self.data_info.user_consumed, user_label, self.n_users
        )
        item_buckets = _bucketize(
            self.data_info.item_consumed, item_label, self.n_items
        )
        solver = self._make_solvers()
        for epoch in range(1, self.n_epochs + 1):
            with time_block(f"Epoch {epoch}", verbose):
                self._solve_side(solver, "user_embed", "item_embed", user_buckets)
                self._solve_side(solver, "item_embed", "user_embed", item_buckets)
            if verbose > 1:
                self.set_embeddings()
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
        self.post_fit()

    def set_embeddings(self):
        p = jax.device_get(self.params)
        self.user_embeds_np = self._append_oov(np.asarray(p["user_embed"]))
        self.item_embeds_np = self._append_oov(np.asarray(p["item_embed"]))
