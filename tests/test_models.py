"""Model tests: LSTM cell vs numpy reference, masking, TDNN/Transformer shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import ModelConfig
from pykaldi2_tpu.models import LSTMStack, NnetAM, TDNNStack, TransformerStack, build_model
from pykaldi2_tpu.models.lstm import lstm_layer_apply, lstm_layer_init


def _np_lstm(x, wx, wh, b):
    """Naive numpy LSTM (gate order i,f,g,o), fp64."""
    B, T, D = x.shape
    H = wh.shape[0]
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    ys = np.zeros((B, T, H))
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))
    for t in range(T):
        gates = x[:, t] @ wx + h @ wh + b
        i, f, g, o = np.split(gates, 4, axis=-1)
        c = sig(f) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        ys[:, t] = h
    return ys


def test_lstm_layer_matches_numpy():
    rng = np.random.RandomState(0)
    B, T, D, H = 3, 12, 8, 16
    x = rng.randn(B, T, D).astype(np.float32)
    p = lstm_layer_init(jax.random.PRNGKey(0), D, H)
    got = np.asarray(lstm_layer_apply(p, jnp.asarray(x), compute_dtype=jnp.float32))
    want = _np_lstm(x.astype(np.float64), np.asarray(p["wx"]), np.asarray(p["wh"]), np.asarray(p["b"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lstm_mask_freezes_state_and_bidi_correct():
    rng = np.random.RandomState(1)
    B, T, D, H = 2, 10, 4, 8
    x = rng.randn(B, T, D).astype(np.float32)
    lens = [10, 6]
    mask = np.zeros((B, T), np.float32)
    for i, L in enumerate(lens):
        mask[i, :L] = 1.0
    stack = LSTMStack(D, H, num_layers=1, bidirectional=True, compute_dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(1))
    out_padded = np.asarray(stack.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    # sequence 1 truncated to its true length, processed alone (no padding)
    x1 = x[1:2, :6]
    out_true = np.asarray(stack.apply(params, jnp.asarray(x1), jnp.ones((1, 6), np.float32)))
    np.testing.assert_allclose(out_padded[1, :6], out_true[0], rtol=1e-4, atol=1e-5)


def test_lstm_projection():
    stack = LSTMStack(6, 16, num_layers=2, proj_size=8, compute_dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(2))
    out = stack.apply(params, jnp.zeros((2, 5, 6)))
    assert out.shape == (2, 5, 8)


def test_tdnn_shapes_and_mask():
    stack = TDNNStack(10, 32, dilations=(1, 2, 3), compute_dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 20, 10).astype(np.float32))
    mask = jnp.ones((2, 20), jnp.float32)
    out = stack.apply(params, x, mask)
    assert out.shape == (2, 20, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_transformer_shapes():
    stack = TransformerStack(10, hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
                             compute_dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(4))
    x = jnp.asarray(np.random.RandomState(4).randn(2, 15, 10).astype(np.float32))
    mask = np.ones((2, 15), np.float32)
    mask[1, 10:] = 0.0
    out = stack.apply(params, x, jnp.asarray(mask))
    assert out.shape == (2, 15, 32)


def test_build_model_and_head():
    cfg = ModelConfig(type="lstm", input_size=20, hidden_size=32, num_layers=2,
                      output_size=50, compute_dtype="float32")
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(5))
    logits = model.apply(params, jnp.zeros((3, 7, 20)))
    assert logits.shape == (3, 7, 50)
    n_params = sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(params))
    # 2-layer LSTM: l0 (20+32)*128+128, l1 (32+32)*128+128 + head 32*50+50
    assert n_params == (20 + 32) * 128 + 128 + (32 + 32) * 128 + 128 + 32 * 50 + 50


def test_padding_contributes_zero_gradient():
    """SURVEY.md §8 hard part 5: padded frames must be exactly-zero contributors."""
    from pykaldi2_tpu.ops import ce_loss

    cfg = ModelConfig(type="lstm", input_size=5, hidden_size=8, num_layers=1,
                      output_size=4, compute_dtype="float32")
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(6))
    rng = np.random.RandomState(6)
    x = rng.randn(1, 6, 5).astype(np.float32)
    labels = np.array([[1, 2, 3, -1, -1, -1]], np.int32)
    mask = (labels >= 0).astype(np.float32)

    def loss(p, xpad):
        logits = model.apply(p, xpad, jnp.asarray(mask))
        return ce_loss(logits, jnp.asarray(labels), jnp.asarray(mask))[0]

    g1 = jax.grad(loss)(params, jnp.asarray(x))
    x2 = x.copy()
    x2[0, 3:] = 99.0  # garbage in padding
    g2 = jax.grad(loss)(params, jnp.asarray(x2))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
