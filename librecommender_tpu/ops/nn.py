"""Neural-net building blocks as pure init/apply function pairs.

Replaces the reference's TF1 layer zoo (libreco/layers/dense.py:12,
attention.py:5-171, transformer.py:10-147, normalization.py:7-32,
recurrent.py:4, convolutional.py:6-31, activation.py:4-8) with a single
pytree-parameter implementation that jit/pjit traces once with static shapes.

Conventions
-----------
- ``init_*`` takes a PRNG key and static sizes, returns a params dict.
- ``apply`` functions are pure; dropout takes an explicit key and a
  ``train`` python bool (static under jit).
- Batch-norm is replaced by layer norm: per-device batch statistics break
  determinism under data parallelism, layer norm is the TPU-idiomatic choice
  and keeps train/eval application identical.
"""
import jax
import jax.numpy as jnp

from .initializers import he_init, truncated_normal


# ----------------------------------------------------------------- dense
def init_dense(rng, in_dim, out_dim):
    return {
        "w": he_init(rng, (in_dim, out_dim), fan_in=in_dim),
        "b": jnp.zeros((out_dim,)),
    }


def dense(params, x):
    return x @ params["w"] + params["b"]


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
    None: lambda x: x,
}


def init_mlp(rng, in_dim, hidden_units, use_ln=False):
    """MLP stack; reference `dense_nn` (libreco/layers/dense.py:12)."""
    layers = []
    dims = [in_dim, *hidden_units]
    for i in range(len(hidden_units)):
        rng, sub = jax.random.split(rng)
        layer = {"dense": init_dense(sub, dims[i], dims[i + 1])}
        if use_ln:
            layer["ln"] = init_layer_norm(dims[i + 1])
        layers.append(layer)
    return {"layers": layers}


def mlp(params, x, activation="relu", dropout_rate=0.0, train=False, rng=None,
        final_activation=True):
    act = ACTIVATIONS[activation]
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x = dense(layer["dense"], x)
        is_last = i == n - 1
        if not is_last or final_activation:
            if "ln" in layer:
                x = layer_norm(layer["ln"], x)
            x = act(x)
            if train and dropout_rate > 0.0:
                rng, sub = jax.random.split(rng)
                x = dropout(x, dropout_rate, sub)
    return x


def dropout(x, rate, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ------------------------------------------------------------- normalization
def init_layer_norm(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(params, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * params["scale"] + params["bias"]


def init_rms_norm(dim):
    return {"scale": jnp.ones((dim,))}


def rms_norm(params, x, eps=1e-6):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * params["scale"]


def l2_normalize(x, axis=-1, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


# ---------------------------------------------------------------- attention
def init_din_attention(rng, embed_dim, hidden_units=(36,)):
    """DIN local-activation unit (paper-faithful MLP attention).

    Reference: `din_attention` libreco/layers/attention.py:28 — MLP over
    [k, q, k - q, k * q] per history position, masked softmax-free weighting.
    """
    in_dim = 4 * embed_dim
    rngs = jax.random.split(rng, len(hidden_units) + 1)
    m = init_mlp(rngs[0], in_dim, list(hidden_units))
    out = init_dense(rngs[1], hidden_units[-1], 1)
    return {"mlp": m, "out": out}


def din_attention(params, queries, keys, mask):
    """queries (B, D) or (T, B, D); keys (B, L, D); mask (B, L) bool
    -> (B, D) / (T, B, D).

    The paper's first MLP layer acts on [k, q, k-q, k*q] per position; the
    concat is never materialized — the (4D, H) weight splits into four
    (D, H) blocks and the q-terms fold to a single per-ROW matmul:
        h = k@(w_k + w_d) + q@(w_q - w_d) + (k*q)@w_p + b
    Algebraically identical, but the (B, L, 4D) intermediate disappears.

    The (T, B, D) form scores T targets against ONE shared key set per
    row — the training fast path: positives and sampled negatives share
    the row's history, so the seq embedding gather, the target-
    independent k-term matmul, and (critically) the backward scatter-add
    of d(seq_emb) into the item table run once per row instead of once
    per target. That scatter was 29% of the profiled DIN train step.
    """
    single = queries.ndim == 2
    if single:
        queries = queries[None]                          # (1, B, D)
    layers = params["mlp"]["layers"]
    first = layers[0]
    D = keys.shape[-1]
    w = first["dense"]["w"]                              # (4D, H)
    w_k, w_q, w_d, w_p = w[:D], w[D:2 * D], w[2 * D:3 * D], w[3 * D:]
    term_q = queries @ (w_q - w_d)                       # (T, B, H)
    term_k = keys @ (w_k + w_d)                          # (B, L, H) shared
    term_p = (keys[None] * queries[:, :, None, :]) @ w_p  # (T, B, L, H)
    h = (
        term_k[None] + term_p + term_q[:, :, None, :] + first["dense"]["b"]
    )
    if "ln" in first:
        h = layer_norm(first["ln"], h)
    h = jax.nn.sigmoid(h)
    if len(layers) > 1:
        h = mlp({"layers": layers[1:]}, h, activation="sigmoid")
    logits = dense(params["out"], h)[..., 0]             # (T, B, L)
    logits = jnp.where(mask[None], logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = jnp.where(
        jnp.any(mask, axis=1)[None, :, None], weights, 0.0
    )
    out = jnp.einsum("tbl,bld->tbd", weights, keys)
    return out[0] if single else out


def init_mha(rng, embed_dim, num_heads, head_dim=None):
    """Multi-head attention (libreco/layers/attention.py:67)."""
    head_dim = head_dim or embed_dim // num_heads
    inner = num_heads * head_dim
    r = jax.random.split(rng, 4)
    return {
        "wq": truncated_normal(r[0], (embed_dim, inner), scale=embed_dim ** -0.5),
        "wk": truncated_normal(r[1], (embed_dim, inner), scale=embed_dim ** -0.5),
        "wv": truncated_normal(r[2], (embed_dim, inner), scale=embed_dim ** -0.5),
        "wo": truncated_normal(r[3], (inner, embed_dim), scale=inner ** -0.5),
    }


# below this Lq*Lk the per-example attention matrices are too small for
# the MXU: the batched einsums lower to dilated convolutions running at
# ~0% utilization (AutoInt's (B, 5, ·) field attention measured 7.4 ms
# per layer step at B=16k; the mul-reduce form 0.3 ms — 25x)
SMALL_ATTENTION_MAX = 128


def _mha_small(params, queries, keys, mask, causal, num_heads):
    """Tiny-window attention (Lq*Lk <= SMALL_ATTENTION_MAX): head-folded
    projection einsums + broadcast-multiply-reduce logits/context on the
    VPU — no per-example batched matmuls for the MXU to choke on."""
    H = num_heads
    B, Lq, D = queries.shape
    Lk, Dk = keys.shape[1], keys.shape[2]
    inner = params["wq"].shape[1]
    dh = inner // H
    dt = queries.dtype
    wq = params["wq"].astype(dt).reshape(D, H, dh)
    wk = params["wk"].astype(keys.dtype).reshape(Dk, H, dh)
    wv = params["wv"].astype(keys.dtype).reshape(Dk, H, dh)
    q = jnp.einsum("bqd,dhe->bqhe", queries, wq)
    k = jnp.einsum("bkd,dhe->bkhe", keys, wk)
    v = jnp.einsum("bkd,dhe->bkhe", keys, wv)
    scale = jnp.sqrt(dh).astype(q.dtype)
    logits = jnp.sum(q[:, :, None] * k[:, None, :], axis=-1) / scale
    if mask is not None:                                  # (B, Lq, Lk, H)
        logits = jnp.where(mask[:, None, :, None], logits, -1e9)
    if causal:
        causal_mask = jnp.tril(jnp.ones((Lq, Lk), dtype=bool))
        logits = jnp.where(causal_mask[None, :, :, None], logits, -1e9)
    weights = jax.nn.softmax(logits, axis=2).astype(v.dtype)
    ctx = jnp.sum(weights[..., None] * v[:, None], axis=2)  # (B, Lq, H, dh)
    wo = params["wo"].astype(ctx.dtype)
    return jnp.einsum("bqhe,heo->bqo", ctx, wo.reshape(H, dh, -1))


def mha(params, queries, keys, mask=None, causal=False, num_heads=1):
    """queries (B, Lq, D); keys (B, Lk, D); mask (B, Lk) bool.

    ``num_heads`` is static config (not stored in params: integer leaves
    would break jax.grad over the params pytree).

    TPU layout note: the projections run on flat (B*L, D) tokens — a
    (B, L, D) operand at small L/D pads to (B, ceil16(L), 128) tiles, so
    keeping the heavy matmul operands 2D roughly halves the HBM bytes per
    pass; only the tiny per-head tensors take 3D/4D shapes. Self-attention
    (queries is keys) fuses the q/k/v projections into ONE matmul.

    Cross-attention deliberately keeps UNFUSED 3D projections: SIM's ESU
    feeds keys that are themselves the output of a one-hot selection
    einsum (GSU top-k), and flattening+concatenating the k/v weights puts
    a reshape between that einsum and the projections, forcing XLA to
    materialize the selected keys instead of fusing selection into the
    k/v matmuls (measured: -35% SIM fit throughput on a v5e)."""
    H = num_heads
    B, Lq, D = queries.shape
    Lk = keys.shape[1]
    if Lq * Lk <= SMALL_ATTENTION_MAX:
        return _mha_small(params, queries, keys, mask, causal, H)
    qf = queries.reshape(B * Lq, D)
    if queries is keys:
        w_qkv = jnp.concatenate(
            [params["wq"], params["wk"], params["wv"]], axis=1
        ).astype(qf.dtype)
        qkv = qf @ w_qkv                                  # (B*L, 3*inner)
        inner = w_qkv.shape[1] // 3
        q = qkv[:, :inner].reshape(B, Lq, H, -1)
        k = qkv[:, inner:2 * inner].reshape(B, Lk, H, -1)
        v = qkv[:, 2 * inner:].reshape(B, Lk, H, -1)
    else:
        q = (qf @ params["wq"].astype(qf.dtype)).reshape(B, Lq, H, -1)
        k = (keys @ params["wk"].astype(keys.dtype)).reshape(B, Lk, H, -1)
        v = (keys @ params["wv"].astype(keys.dtype)).reshape(B, Lk, H, -1)
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    if causal:
        causal_mask = jnp.tril(jnp.ones((Lq, Lk), dtype=bool))
        logits = jnp.where(causal_mask[None, None], logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B * Lq, -1)
    return (out @ params["wo"].astype(out.dtype)).reshape(B, Lq, -1)


# -------------------------------------------------------------- transformer
def init_transformer_layer(rng, embed_dim, num_heads, ffn_dim):
    """Pre-LN encoder layer (libreco/layers/transformer.py:10)."""
    r = jax.random.split(rng, 3)
    return {
        "mha": init_mha(r[0], embed_dim, num_heads),
        "ln1": init_layer_norm(embed_dim),
        "ln2": init_layer_norm(embed_dim),
        "ffn1": init_dense(r[1], embed_dim, ffn_dim),
        "ffn2": init_dense(r[2], ffn_dim, embed_dim),
    }


def transformer_layer(params, x, mask=None, causal=False, num_heads=1):
    # residual/LN/FFN flow on flat (B*L, D) tokens (see the mha layout
    # note); only attention sees the (B, L, D) view
    B, L, D = x.shape
    xf = x.reshape(B * L, D)
    h = layer_norm(params["ln1"], xf).reshape(B, L, D)
    att = mha(params["mha"], h, h, mask=mask, causal=causal,
              num_heads=num_heads)
    xf = xf + att.reshape(B * L, D)
    h = layer_norm(params["ln2"], xf)
    h = dense(params["ffn2"], jax.nn.relu(dense(params["ffn1"], h)))
    return (xf + h).reshape(B, L, D)


def transformer_target_out(layers, seq_x, seq_mask, tgt_x, num_heads=1,
                           causal=False):
    """Pre-LN encoder stack output at the TARGET position only.

    BST-style models append the target item to the behavior sequence and
    read only the target position's output (libreco/algorithms/
    transformer.py:90 reads ``tfm_net[:, -1]``), so running the full
    encoder over every (target, sequence) pair wastes the seq-token FFN /
    projection / elementwise passes T times over. Whenever seq-token
    outputs are target-independent — a single layer (their outputs are
    never read) or causal masking (they cannot attend to the target, which
    sits last) — the seq tokens are processed ONCE and shared across all T
    target blocks: per layer, seq rows only need K/V projections, while the
    Q/K/V + attention + FFN run on the (T, B) target rows alone.

    layers: list of ``init_transformer_layer`` params. seq_x (B, L, D);
    seq_mask (B, L) bool; tgt_x (T, B, D). Returns (T, B, D) — exact match
    of ``transformer_layer`` applied to [seq, target] under the stated
    conditions.
    """
    if len(layers) > 1 and not causal:
        raise ValueError(
            "shared-seq target output is exact only for 1 layer or with "
            "causal masking"
        )
    H = num_heads
    T, B, D = tgt_x.shape
    L = seq_x.shape[1]
    x_seq, x_tgt = seq_x, tgt_x
    for li, layer in enumerate(layers):
        p = layer["mha"]
        # head split folded INTO the projection einsums (no reshape between
        # a projection GEMM and its consumer): the flatten-project-reshape
        # form forced XLA to materialize (T*B, inner) <-> (T, B, H, d)
        # layout transposes in forward AND backward — measured 1.45 ms of
        # copies per step at bench geometry; this form runs 0.66 ms with
        # identical math (bf16-rounding-level equal outputs)
        inner = p["wq"].shape[1]
        d = inner // H
        dt = x_seq.dtype
        wq = p["wq"].astype(dt).reshape(D, H, d)
        wk = p["wk"].astype(dt).reshape(D, H, d)
        wv = p["wv"].astype(dt).reshape(D, H, d)
        wo = p["wo"].astype(dt).reshape(H, d, D)
        h_seq = layer_norm(layer["ln1"], x_seq)             # (B, L, D)
        k_seq = jnp.einsum("bld,dhe->blhe", h_seq, wk)
        v_seq = jnp.einsum("bld,dhe->blhe", h_seq, wv)
        h_tgt = layer_norm(layer["ln1"], x_tgt)             # (T, B, D)
        q_t = jnp.einsum("abd,dhe->abhe", h_tgt, wq)
        k_t = jnp.einsum("abd,dhe->abhe", h_tgt, wk)
        v_t = jnp.einsum("abd,dhe->abhe", h_tgt, wv)
        scale = jnp.sqrt(d).astype(q_t.dtype)
        logit_seq = jnp.einsum("tbhd,blhd->tbhl", q_t, k_seq) / scale
        logit_seq = jnp.where(seq_mask[None, :, None, :], logit_seq, -1e9)
        logit_self = jnp.sum(q_t * k_t, axis=-1)[..., None] / scale
        weights = jax.nn.softmax(
            jnp.concatenate([logit_seq, logit_self], axis=-1), axis=-1
        ).astype(v_t.dtype)                                 # (T, B, H, L+1)
        att = (
            jnp.einsum("tbhl,blhd->tbhd", weights[..., :L], v_seq)
            + weights[..., L:] * v_t
        )
        xf = x_tgt + jnp.einsum("abhd,hde->abe", att, wo)
        h2 = layer_norm(layer["ln2"], xf)
        h2 = dense(layer["ffn2"], jax.nn.relu(dense(layer["ffn1"], h2)))
        x_tgt = xf + h2
        if li < len(layers) - 1:
            # causal case only: seq tokens attend among themselves exactly
            # as in the full pass (tril(L+1)'s top-left block is tril(L))
            x_seq = transformer_layer(
                layer, x_seq, mask=seq_mask, causal=True, num_heads=H
            )
    return x_tgt


def positional_encoding(seq_len, dim):
    """Sinusoidal positions (libreco/layers/transformer.py:147)."""
    pos = jnp.arange(seq_len)[:, None].astype(jnp.float32)
    i = jnp.arange(dim)[None, :].astype(jnp.float32)
    angle = pos / jnp.power(10000.0, (2.0 * jnp.floor(i / 2.0)) / dim)
    enc = jnp.where(jnp.arange(dim)[None, :] % 2 == 0, jnp.sin(angle), jnp.cos(angle))
    return enc


# ---------------------------------------------------------------- recurrent
def init_gru(rng, in_dim, hidden_dim):
    r = jax.random.split(rng, 2)
    scale_i = in_dim ** -0.5
    scale_h = hidden_dim ** -0.5
    return {
        "wi": truncated_normal(r[0], (in_dim, 3 * hidden_dim), scale=scale_i),
        "wh": truncated_normal(r[1], (hidden_dim, 3 * hidden_dim), scale=scale_h),
        "b": jnp.zeros((3 * hidden_dim,)),
    }


def gru(params, x, mask=None, h0=None):
    """GRU over (B, L, D_in) -> final hidden (B, H) and all states (B, L, H).

    Masked positions keep the previous hidden state, so right-padded
    sequences yield the state at their true last step. Implemented with
    `lax.scan` (libreco/layers/recurrent.py:4 used cudnn GRU).
    """
    B, L, D = x.shape
    H = params["wh"].shape[0]
    h_init = jnp.zeros((B, H)) if h0 is None else h0
    # hoist the input projection out of the scan: ONE (B*L, D) @ (D, 3H)
    # MXU matmul instead of L small ones inside the loop (the cuDNN RNN
    # trick); the scan keeps only the recurrent h @ wh
    gates_x = (x.reshape(B * L, D) @ params["wi"] + params["b"]).reshape(B, L, 3 * H)
    gs = jnp.swapaxes(gates_x, 0, 1)                             # (L, B, 3H)
    ms = (jnp.swapaxes(mask, 0, 1) if mask is not None
          else jnp.ones((L, B), dtype=bool))

    def step(h, inputs):
        gx, mt = inputs
        gates_h = h @ params["wh"]
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(mt[:, None], h_new, h)
        return h_new, h_new

    h_final, hs = jax.lax.scan(step, h_init, (gs, ms))
    return h_final, jnp.swapaxes(hs, 0, 1)


def init_lstm(rng, in_dim, hidden_dim):
    r = jax.random.split(rng, 2)
    return {
        "wi": truncated_normal(r[0], (in_dim, 4 * hidden_dim), scale=in_dim ** -0.5),
        "wh": truncated_normal(r[1], (hidden_dim, 4 * hidden_dim), scale=hidden_dim ** -0.5),
        "b": jnp.zeros((4 * hidden_dim,)),
    }


def lstm(params, x, mask=None):
    B, L, D = x.shape
    H = params["wh"].shape[0]
    # input projection hoisted out of the scan (see gru)
    gates_x = (x.reshape(B * L, D) @ params["wi"] + params["b"]).reshape(B, L, 4 * H)
    gs = jnp.swapaxes(gates_x, 0, 1)
    ms = (jnp.swapaxes(mask, 0, 1) if mask is not None
          else jnp.ones((L, B), dtype=bool))

    def step(carry, inputs):
        h, c = carry
        gx, mt = inputs
        gates = gx + h @ params["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        keep = mt[:, None]
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)), h_new

    (h_final, _), hs = jax.lax.scan(step, (jnp.zeros((B, H)), jnp.zeros((B, H))), (gs, ms))
    return h_final, jnp.swapaxes(hs, 0, 1)


# ------------------------------------------------------------ convolutional
def init_conv1d(rng, kernel_size, in_ch, out_ch):
    fan_in = kernel_size * in_ch
    return {
        "w": he_init(rng, (kernel_size, in_ch, out_ch), fan_in=fan_in),
        "b": jnp.zeros((out_ch,)),
    }


def conv1d(params, x, padding="VALID", dilation=1):
    """x (B, L, C_in) -> (B, L', C_out); lowered onto the MXU by XLA."""
    out = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["b"]


def causal_conv1d(params, x, dilation=1):
    """Left-padded dilated conv (WaveNet, libreco/layers/convolutional.py:31)."""
    k = params["w"].shape[0]
    pad = dilation * (k - 1)
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return conv1d(params, x, padding="VALID", dilation=dilation)
