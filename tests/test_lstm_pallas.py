"""Pallas LSTM sequence kernels vs the lax.scan reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pykaldi2_tpu.ops.lstm_pallas as LP
from pykaldi2_tpu.models.lstm import lstm_layer_apply, lstm_layer_init


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _data(seed=0, b=8, t=6, d=16, h=128):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, d).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[-1, t // 2 :] = 0.0  # one padded row
    params = lstm_layer_init(jax.random.PRNGKey(seed), d, h)
    return x, mask, params


def test_pallas_forward_matches_scan():
    x, mask, params = _data()
    ref = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask),
                           compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask),
                           compute_dtype=jnp.float32, use_pallas=True)
    # pallas path uses bf16 Wh; tolerance accordingly
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_pallas_reverse_matches_scan():
    x, mask, params = _data(seed=1)
    ref = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask), reverse=True,
                           compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask), reverse=True,
                           compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_pallas_gradients_match_scan():
    x, mask, params = _data(seed=2, t=5)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)

    def loss(p, xx, use_pallas):
        ys = lstm_layer_apply(p, xx, mj, compute_dtype=jnp.float32, use_pallas=use_pallas)
        w = jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 1e-3
        return jnp.sum(ys * w)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, xj, False)
    g_pal = jax.grad(loss, argnums=(0, 1))(params, xj, True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-2, rtol=5e-2)


def test_unsupported_shapes_fall_back():
    # B=3 (not multiple of 8) must silently use the scan path
    rng = np.random.RandomState(3)
    x = rng.randn(3, 4, 8).astype(np.float32)
    params = lstm_layer_init(jax.random.PRNGKey(3), 8, 24)
    out = lstm_layer_apply(params, jnp.asarray(x), compute_dtype=jnp.float32, use_pallas=True)
    assert out.shape == (3, 4, 24)


def test_pallas_bf16_stream_mode(monkeypatch):
    """Large-batch mode (bf16-streamed xp/dys/dgates) stays close to scan."""
    import pykaldi2_tpu.ops.lstm_pallas as LP2

    monkeypatch.setattr(LP2, "_fp32_mode", lambda b, h: False)
    x, mask, params = _data(seed=4, t=5)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    ref = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2, rtol=5e-2)

    def loss(p, use_pallas):
        ys = lstm_layer_apply(p, xj, mj, compute_dtype=jnp.float32, use_pallas=use_pallas)
        return jnp.sum(ys * jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 1e-3)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-1, rtol=1e-1)


# ---------------------------------------------------------------------------
# projected-LSTM (LSTMP) kernels
# ---------------------------------------------------------------------------


def _proj_data(seed=10, b=8, t=6, d=16, h=256, p=128):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, d).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[-1, t // 2 :] = 0.0  # one padded row
    params = lstm_layer_init(jax.random.PRNGKey(seed), d, h, proj_size=p)
    return x, mask, params


def test_pallas_proj_forward_matches_scan():
    x, mask, params = _proj_data()
    assert LP.supported_proj(x.shape[0], 256, 128)
    ref = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask),
                           compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask),
                           compute_dtype=jnp.float32, use_pallas=True)
    assert got.shape == (x.shape[0], x.shape[1], 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_pallas_proj_reverse_matches_scan():
    x, mask, params = _proj_data(seed=11)
    ref = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask), reverse=True,
                           compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, jnp.asarray(x), jnp.asarray(mask), reverse=True,
                           compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_pallas_proj_gradients_match_scan():
    x, mask, params = _proj_data(seed=12, t=5)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)

    def loss(p, xx, use_pallas):
        ys = lstm_layer_apply(p, xx, mj, compute_dtype=jnp.float32, use_pallas=use_pallas)
        w = jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 1e-3
        return jnp.sum(ys * w)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, xj, False)
    g_pal = jax.grad(loss, argnums=(0, 1))(params, xj, True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-2, rtol=5e-2)


def test_pallas_proj_bf16_stream_mode(monkeypatch):
    import pykaldi2_tpu.ops.lstm_pallas as LP2

    monkeypatch.setattr(LP2, "_fp32_mode_proj", lambda b, h, p: False)
    x, mask, params = _proj_data(seed=13, t=5)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    ref = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2, rtol=5e-2)

    def loss(p, use_pallas):
        ys = lstm_layer_apply(p, xj, mj, compute_dtype=jnp.float32, use_pallas=use_pallas)
        return jnp.sum(ys * jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 1e-3)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-1, rtol=1e-1)


def test_pallas_proj_unsupported_falls_back():
    # P=24 (not 128-aligned) must silently use the scan path
    rng = np.random.RandomState(14)
    x = rng.randn(8, 4, 8).astype(np.float32)
    params = lstm_layer_init(jax.random.PRNGKey(14), 8, 128, proj_size=24)
    out = lstm_layer_apply(params, jnp.asarray(x), compute_dtype=jnp.float32, use_pallas=True)
    assert out.shape == (8, 4, 24)


def test_pallas_batch_tiling_matches_scan(monkeypatch):
    """Force tiny batch tiles so the grid=(B/tile, T) path is exercised."""
    import pykaldi2_tpu.ops.lstm_pallas as LP2

    monkeypatch.setattr(LP2, "_tile_b", lambda b, h: 8 if b % 8 == 0 else 0)
    x, mask, params = _data(seed=6, b=24, t=5)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    ref = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def loss(p, use_pallas):
        ys = lstm_layer_apply(p, xj, mj, compute_dtype=jnp.float32, use_pallas=use_pallas)
        return jnp.sum(ys * jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 1e-3)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        a, b = np.asarray(a), np.asarray(b)
        # magnitude-normalized: the arange-weighted loss inflates absolutes
        assert np.abs(b - a).max() <= 2e-2 * max(np.abs(a).max(), 1.0)


def test_pallas_proj_batch_tiling_matches_scan(monkeypatch):
    import pykaldi2_tpu.ops.lstm_pallas as LP2

    monkeypatch.setattr(LP2, "_tile_b_proj", lambda b, h, p: 8 if b % 8 == 0 else 0)
    x, mask, params = _proj_data(seed=7, b=16, t=5)
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    ref = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=False)
    got = lstm_layer_apply(params, xj, mj, compute_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def loss(p, use_pallas):
        ys = lstm_layer_apply(p, xj, mj, compute_dtype=jnp.float32, use_pallas=use_pallas)
        return jnp.sum(ys * jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 1e-3)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(b - a).max() <= 2e-2 * max(np.abs(a).max(), 1.0)
