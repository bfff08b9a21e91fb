"""LSTM / BLSTM stack as ``lax.scan`` over fused-gate GEMMs.

Reference behavior: pykaldi2/models/lstm.py ``LSTMStack`` wrapping
``torch.nn.LSTM`` (cuDNN fused kernels, SURVEY.md §3.2 "PyTorch + cuDNN
LSTM"). TPU-native replacement:

  * input-to-gate projection for ALL timesteps is a single [B*T, D]x[D, 4H]
    bf16 GEMM outside the scan (MXU-friendly, time-parallel);
  * the scan body only does the [B, H]x[H, 4H] recurrent GEMM + elementwise
    gates (fp32 cell state for numerical stability);
  * masks carry state through padded frames unchanged, which also makes the
    reversed scan correct for right-padded batches (state stays zero until
    the first valid frame).

Gate order: i, f, g (cell candidate), o.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def lstm_layer_init(key, input_size: int, hidden_size: int, proj_size: int = 0) -> dict:
    """Torch-convention init: U(-1/sqrt(H), 1/sqrt(H)) for all tensors."""
    k = 1.0 / np.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    out_size = proj_size or hidden_size
    p = {
        "wx": _uniform(keys[0], (input_size, 4 * hidden_size), k),
        "wh": _uniform(keys[1], (out_size, 4 * hidden_size), k),
        "b": _uniform(keys[2], (4 * hidden_size,), k),
    }
    if proj_size:
        p["wp"] = _uniform(keys[3], (hidden_size, proj_size), k)
    return p


import os

# Pallas fused recurrence: keeps Wh VMEM-resident across timesteps
# (ops/lstm_pallas.py). Default: on for TPU backends, off elsewhere;
# override with PK2_PALLAS_LSTM=0/1.
def _use_pallas_default() -> bool:
    env = os.environ.get("PK2_PALLAS_LSTM")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def lstm_layer_apply(
    params: dict,
    x: jax.Array,                     # [B, T, D]
    mask: Optional[jax.Array] = None, # [B, T] 1.0 on valid frames
    reverse: bool = False,
    compute_dtype=jnp.bfloat16,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Run one (uni-directional) LSTM layer; returns [B, T, H or proj]."""
    B, T, _ = x.shape
    H4 = params["wx"].shape[1]
    H = H4 // 4
    cd = compute_dtype
    # whole-sequence input projection: one big MXU GEMM
    xp = jnp.dot(x.astype(cd), params["wx"].astype(cd), preferred_element_type=jnp.float32)
    xp = xp + params["b"]
    wh = params["wh"].astype(cd)
    wp = params.get("wp")
    out_size = params["wh"].shape[0]

    xp_t = jnp.swapaxes(xp, 0, 1)  # [T, B, 4H]
    if mask is None:
        mask_t = jnp.ones((T, B, 1), jnp.float32)
    else:
        mask_t = jnp.swapaxes(mask, 0, 1)[..., None].astype(jnp.float32)

    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from pykaldi2_tpu.ops import lstm_pallas

        if wp is None and lstm_pallas.supported(B, H):
            xp_k, mask_k = (xp_t, mask_t) if not reverse else (xp_t[::-1], mask_t[::-1])
            ys = lstm_pallas.lstm_seq_pallas(xp_k, params["wh"], mask_k)
            if reverse:
                ys = ys[::-1]
            return jnp.swapaxes(ys, 0, 1)
        if wp is not None and lstm_pallas.supported_proj(B, H, out_size):
            xp_k, mask_k = (xp_t, mask_t) if not reverse else (xp_t[::-1], mask_t[::-1])
            ys = lstm_pallas.lstm_seq_proj_pallas(xp_k, params["wh"], wp, mask_k)
            if reverse:
                ys = ys[::-1]
            return jnp.swapaxes(ys, 0, 1)

    def step(carry, inp):
        h, c = carry
        gates_x, m = inp
        gates = gates_x + jnp.dot(h.astype(cd), wh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_full = o * jnp.tanh(c_new)
        if wp is not None:
            h_new = jnp.dot(h_full.astype(cd), wp.astype(cd), preferred_element_type=jnp.float32)
        else:
            h_new = h_full
        # padded frames: carry state through unchanged
        h_new = m * h_new + (1.0 - m) * h
        c_new = m * c_new + (1.0 - m) * c
        return (h_new, c_new), h_new

    # derive the zero carry from the input so it inherits the input's
    # varying-axes type under shard_map (check_vma replication tracking)
    zero_row = xp_t[0] * 0.0  # [B, 4H]
    h0 = zero_row[:, :out_size]
    c0 = zero_row[:, :H]
    _, ys = jax.lax.scan(step, (h0, c0), (xp_t, mask_t), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, out]


class LSTMStack:
    """Multi-layer (B)LSTM; mirrors the reference LSTMStack constructor."""

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        num_layers: int,
        dropout: float = 0.0,
        bidirectional: bool = False,
        proj_size: int = 0,
        compute_dtype=jnp.bfloat16,
    ):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.dropout = dropout
        self.bidirectional = bidirectional
        self.proj_size = proj_size
        self.compute_dtype = compute_dtype
        per_dir = proj_size or hidden_size
        self.output_size = per_dir * (2 if bidirectional else 1)

    def init(self, key) -> dict:
        layers = []
        dir_out = (self.proj_size or self.hidden_size) * (2 if self.bidirectional else 1)
        for l in range(self.num_layers):
            in_size = self.input_size if l == 0 else dir_out
            if self.bidirectional:
                key, k1, k2 = jax.random.split(key, 3)
                layers.append({
                    "fwd": lstm_layer_init(k1, in_size, self.hidden_size, self.proj_size),
                    "bwd": lstm_layer_init(k2, in_size, self.hidden_size, self.proj_size),
                })
            else:
                key, k1 = jax.random.split(key)
                layers.append({"fwd": lstm_layer_init(k1, in_size, self.hidden_size, self.proj_size)})
        return {"layers": layers}

    def apply(
        self,
        params: dict,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        for l, lp in enumerate(params["layers"]):
            outs = [lstm_layer_apply(lp["fwd"], x, mask, False, self.compute_dtype)]
            if self.bidirectional:
                outs.append(lstm_layer_apply(lp["bwd"], x, mask, True, self.compute_dtype))
            x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if train and self.dropout > 0.0 and l < self.num_layers - 1:
                if dropout_key is None:
                    raise ValueError("dropout enabled but no dropout_key supplied")
                dropout_key, sub = jax.random.split(dropout_key)
                keep = 1.0 - self.dropout
                x = x * jax.random.bernoulli(sub, keep, x.shape) / keep
        return x
