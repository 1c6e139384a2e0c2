"""Loss functions: one module for every objective in the framework.

Reference parity: libreco/tfops/loss.py:4-120 (MSE / BCE / focal / BPR /
max-margin / in-batch softmax with popularity correction and accidental-hit
removal) and libreco/torchops/loss.py:5-67. All functions are pure, take
logits (not probabilities), support an optional per-sample ``weight`` mask so
padded batch tails contribute zero loss, and reduce with a masked mean.
"""
import jax
import jax.numpy as jnp


def _masked_mean(values, weight):
    if weight is None:
        return jnp.mean(values)
    weight = weight.astype(values.dtype)
    return jnp.sum(values * weight) / jnp.maximum(jnp.sum(weight), 1.0)


# --------------------------------------------------------------- pointwise
def mse_loss(logits, labels, weight=None):
    return _masked_mean(jnp.square(logits - labels), weight)


def bce_loss(logits, labels, weight=None):
    """Numerically stable sigmoid cross-entropy from logits."""
    per = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _masked_mean(per, weight)


def focal_loss(logits, labels, weight=None, alpha=0.25, gamma=2.0):
    """Focal loss (Lin et al. 2017): down-weight easy examples.

    Matches the reference formulation (libreco/tfops/loss.py focal path):
    ``alpha_t * (1 - p_t)^gamma * -log(p_t)``.
    """
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    ce = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per = alpha_t * jnp.power(1.0 - p_t, gamma) * ce
    return _masked_mean(per, weight)


# ---------------------------------------------------------------- pairwise
def bpr_loss(pos_scores, neg_scores, weight=None):
    """Bayesian Personalized Ranking: -log sigmoid(pos - neg)."""
    per = -jax.nn.log_sigmoid(pos_scores - neg_scores)
    return _masked_mean(per, weight)


def max_margin_loss(pos_scores, neg_scores, weight=None, margin=1.0):
    per = jnp.maximum(0.0, margin - pos_scores + neg_scores)
    return _masked_mean(per, weight)


# ---------------------------------------------------------------- listwise
def softmax_cross_entropy_loss(
    user_embeds,
    item_embeds,
    weight=None,
    item_ids=None,
    correction_probs=None,
    temperature=1.0,
    remove_accidental_hits=False,
):
    """In-batch sampled softmax over the batch's items.

    logits[i, j] = <u_i, v_j> / T - log(p_j)  (log-popularity correction of
    the in-batch sampling bias); the diagonal is the positive. Accidental
    hits -- off-diagonal columns whose item id equals row i's positive item --
    are masked to -inf. Reference: libreco/tfops/loss.py in-batch softmax
    (TwoTower ``loss_type="softmax"``).
    """
    # The (B, B) matrix is touched exactly twice (fwd reduce + bwd softmax
    # pass): the positive logit comes straight from the paired vectors and
    # is re-added to the denominator with logaddexp, so neither
    # log_softmax's (B, B) output nor jnp.diagonal's backward scatter-add
    # into a (B, B) zeros (a 268 MB materialization at B=8192 — profiled
    # as the TwoTower step's largest single op) ever exists.
    logits = (user_embeds @ item_embeds.T) / temperature
    diag = jnp.sum(user_embeds * item_embeds, axis=1) / temperature
    if correction_probs is not None:
        logp = jnp.log(jnp.clip(correction_probs, 1e-8, 1.0))
        logits = logits - logp[None, :]
        diag = diag - logp
    n = logits.shape[0]
    # mask the diagonal out of the matrix (re-added exactly via logaddexp);
    # with hit removal the self-hit column covers it
    if remove_accidental_hits and item_ids is not None:
        mask = item_ids[None, :] == item_ids[:, None]
    else:
        mask = jnp.eye(n, dtype=bool)
    if weight is not None:
        # padded batch-tail columns must not pollute other rows'
        # denominators (their own rows are dropped by _masked_mean)
        mask = mask | (weight <= 0.0)[None, :]
    logits = jnp.where(mask, -1e9, logits)
    lse_rest = jax.scipy.special.logsumexp(logits, axis=1)
    denom = jnp.logaddexp(lse_rest, diag)
    per = denom - diag
    return _masked_mean(per, weight)


def sampled_softmax_loss(
    user_embeds,
    item_weights,
    item_biases,
    pos_items,
    neg_items,
    weight=None,
    remove_accidental_hits=True,
):
    """Sampled softmax over shared negative candidates.

    Each row's candidate set = its positive + ``neg_items`` (shared across the
    batch, like tf.nn.sampled_softmax_loss with a uniform candidate sampler,
    reference libreco/training/tf_trainer.py:162-235). Log-uniform correction
    is omitted because candidates are drawn uniformly.
    """
    pos_w = item_weights[pos_items]          # (B, D)
    pos_b = item_biases[pos_items]           # (B,)
    neg_w = item_weights[neg_items]          # (S, D)
    neg_b = item_biases[neg_items]           # (S,)
    pos_logit = jnp.sum(user_embeds * pos_w, axis=1) + pos_b          # (B,)
    neg_logits = user_embeds @ neg_w.T + neg_b[None, :]               # (B, S)
    if remove_accidental_hits:
        hit = neg_items[None, :] == pos_items[:, None]
        neg_logits = jnp.where(hit, -1e9, neg_logits)
    # join the positive into the denominator via logaddexp instead of
    # concatenating a (B, S+1) logits matrix and materializing
    # log_softmax over it (the padded (B, S+1) add + exp were the two
    # largest ops of the profiled YouTubeRetrieval step)
    lse_neg = jax.scipy.special.logsumexp(neg_logits, axis=1)
    per = jnp.logaddexp(lse_neg, pos_logit) - pos_logit
    return _masked_mean(per, weight)


def nce_loss(
    user_embeds,
    item_weights,
    item_biases,
    pos_items,
    neg_items,
    weight=None,
):
    """Noise-contrastive estimation with shared uniform negatives.

    Binary logistic on the positive plus each negative candidate
    (tf.nn.nce_loss semantics, reference libreco/training/tf_trainer.py:162).
    """
    pos_w = item_weights[pos_items]
    pos_b = item_biases[pos_items]
    neg_w = item_weights[neg_items]
    neg_b = item_biases[neg_items]
    pos_logit = jnp.sum(user_embeds * pos_w, axis=1) + pos_b
    neg_logits = user_embeds @ neg_w.T + neg_b[None, :]
    pos_loss = -jax.nn.log_sigmoid(pos_logit)
    neg_loss = -jnp.sum(jax.nn.log_sigmoid(-neg_logits), axis=1)
    return _masked_mean(pos_loss + neg_loss, weight)


def ssl_loss(view1_embeds, view2_embeds, temperature=1.0):
    """Contrastive self-supervised loss between two feature views
    (TwoTower SSL branch, reference libreco/algorithms/two_tower.py:189-203)."""
    v1 = view1_embeds / jnp.linalg.norm(view1_embeds, axis=1, keepdims=True).clip(1e-8)
    v2 = view2_embeds / jnp.linalg.norm(view2_embeds, axis=1, keepdims=True).clip(1e-8)
    logits = (v1 @ v2.T) / temperature
    log_probs = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.diagonal(log_probs))


POINTWISE_LOSSES = ("cross_entropy", "focal")
PAIRWISE_LOSSES = ("bpr", "max_margin")
LISTWISE_LOSSES = ("softmax", "nce", "sampled_softmax")
