"""Layer-level numerics (reference analog: tests/test_tf_layers.py) —
hand-computed values and invariants for the ops/nn building blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from librecommender_tpu.ops import nn


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


def test_dense_linear(rng):
    p = nn.init_dense(rng, 3, 2)
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    out = nn.dense(p, x)
    expected = x @ p["w"] + p["b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_layer_norm_statistics():
    p = nn.init_layer_norm(8)
    x = jnp.asarray(np.random.default_rng(0).normal(2.0, 3.0, (4, 8)),
                    jnp.float32)
    out = np.asarray(nn.layer_norm(p, x))
    np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=-1), 1.0, atol=1e-2)


def test_rms_norm_scale():
    p = nn.init_rms_norm(4)
    x = jnp.asarray([[3.0, 4.0, 0.0, 0.0]])
    out = np.asarray(nn.rms_norm(p, x))
    rms = np.sqrt(np.mean(np.square([3.0, 4.0, 0.0, 0.0])))
    np.testing.assert_allclose(out[0, 0], 3.0 / rms, rtol=1e-5)


def test_l2_normalize_unit_norm():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 7)), jnp.float32)
    out = np.asarray(nn.l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_din_attention_masked_positions_ignored(rng):
    """Fully-masked history yields a zero context vector; masked positions
    never contribute."""
    D = 8
    p = nn.init_din_attention(rng, D)
    q = jnp.asarray(np.random.default_rng(2).normal(size=(2, D)), jnp.float32)
    keys = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 5, D)), jnp.float32
    )
    none = jnp.zeros((2, 5), bool)
    out_none = np.asarray(nn.din_attention(p, q, keys, none))
    np.testing.assert_allclose(out_none, 0.0, atol=1e-6)

    # changing a masked key must not change the output
    mask = jnp.asarray([[True, True, False, False, False]] * 2)
    out1 = np.asarray(nn.din_attention(p, q, keys, mask))
    keys2 = keys.at[:, 3, :].set(99.0)
    out2 = np.asarray(nn.din_attention(p, q, keys2, mask))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_mha_mask_and_causal(rng):
    D, H = 8, 2
    p = nn.init_mha(rng, D, H)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 4, D)), jnp.float32)
    # masked key position must not affect outputs
    mask = jnp.asarray([[True, True, True, False]])
    out1 = np.asarray(nn.mha(p, x, x, mask=mask, num_heads=H))
    x2 = x.at[:, 3, :].set(7.0)
    out2 = np.asarray(nn.mha(p, x2, x2, mask=mask, num_heads=H))
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], rtol=1e-4, atol=1e-5)

    # causal: position 0 output depends only on position 0 input
    outc1 = np.asarray(nn.mha(p, x, x, causal=True, num_heads=H))
    x3 = x.at[:, 2, :].set(-5.0)
    outc2 = np.asarray(nn.mha(p, x3, x3, causal=True, num_heads=H))
    np.testing.assert_allclose(outc1[:, 0], outc2[:, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outc1[:, 1], outc2[:, 1], rtol=1e-4, atol=1e-5)
    assert not np.allclose(outc1[:, 2], outc2[:, 2])


def test_positional_encoding_sinusoid():
    pe = np.asarray(nn.positional_encoding(10, 8))
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(pe[0, 0], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1], 1.0, atol=1e-7)  # cos(0)
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), rtol=1e-5)


def test_gru_respects_mask(rng):
    D, H = 4, 6
    p = nn.init_gru(rng, D, H)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 5, D)), jnp.float32)
    mask = jnp.asarray([[True] * 5, [True, True, False, False, False]])
    h, _ = nn.gru(p, x, mask=mask)
    # row 1's final state must equal running only its first two steps
    h_short, _ = nn.gru(p, x[1:2, :2], mask=jnp.ones((1, 2), bool))
    np.testing.assert_allclose(
        np.asarray(h)[1], np.asarray(h_short)[0], rtol=1e-5, atol=1e-6
    )


def test_causal_conv_no_future_leak(rng):
    p = nn.init_conv1d(rng, 2, 3, 3)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 6, 3)), jnp.float32)
    out1 = np.asarray(nn.causal_conv1d(p, x))
    x2 = x.at[:, 4, :].set(50.0)  # change a late position
    out2 = np.asarray(nn.causal_conv1d(p, x2))
    # outputs before position 4 unchanged
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], rtol=1e-5)


def test_mlp_dropout_train_eval(rng):
    p = nn.init_mlp(rng, 4, [8])
    x = jnp.ones((16, 4))
    out_eval = nn.mlp(p, x, dropout_rate=0.5, train=False, rng=None)
    out_eval2 = nn.mlp(p, x, dropout_rate=0.5, train=False, rng=None)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))
    out_train = nn.mlp(p, x, dropout_rate=0.5, train=True,
                       rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))


@pytest.mark.parametrize("n_layers,causal", [(1, False), (1, True), (3, True)])
def test_transformer_target_out_matches_full_stack(rng, n_layers, causal):
    """The shared-seq target-position output equals running the full
    encoder over every [seq, target] pair (exact for 1 layer or causal)."""
    B, L, D, H, T = 4, 6, 16, 2, 3
    rs = jax.random.split(rng, 4 + n_layers)
    layers = [
        nn.init_transformer_layer(rs[i], D, H, 4 * D) for i in range(n_layers)
    ]
    seq_x = jax.random.normal(rs[-4], (B, L, D))
    tgt_x = jax.random.normal(rs[-3], (T, B, D))
    seq_mask = jax.random.bernoulli(rs[-2], 0.7, (B, L))
    seq_mask = seq_mask.at[:, 0].set(True)  # no empty rows
    fast = nn.transformer_target_out(
        layers, seq_x, seq_mask, tgt_x, num_heads=H, causal=causal
    )
    # reference: full encoder per target block
    for t in range(T):
        x = jnp.concatenate([seq_x, tgt_x[t][:, None, :]], axis=1)
        full_mask = jnp.concatenate(
            [seq_mask, jnp.ones((B, 1), bool)], axis=1
        )
        for layer in layers:
            x = nn.transformer_layer(
                layer, x, mask=full_mask, causal=causal, num_heads=H
            )
        np.testing.assert_allclose(
            np.asarray(fast[t]), np.asarray(x[:, -1, :]), rtol=2e-4, atol=2e-5
        )


def test_transformer_target_out_rejects_inexact_config(rng):
    layers = [nn.init_transformer_layer(rng, 8, 1, 16) for _ in range(2)]
    with pytest.raises(ValueError):
        nn.transformer_target_out(
            layers, jnp.zeros((2, 3, 8)), jnp.ones((2, 3), bool),
            jnp.zeros((1, 2, 8)), num_heads=1, causal=False,
        )
