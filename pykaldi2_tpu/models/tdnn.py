"""TDNN acoustic model: dilated 1-D convolutions over time.

Reference scope: TDNN-class models per BASELINE.json ("LSTM/TDNN acoustic
models"); Kaldi TDNNs are splice+affine+ReLU+renorm stacks — here each layer
is a dilated conv (an MXU GEMM after im2col by XLA), ReLU, and layer
normalization over features (the renorm equivalent), all time-parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _conv_init(key, kernel: int, in_size: int, out_size: int):
    fan_in = kernel * in_size
    bound = np.sqrt(1.0 / fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kernel, in_size, out_size), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_size,), jnp.float32, -bound, bound),
        "ln_scale": jnp.ones((out_size,), jnp.float32),
        "ln_bias": jnp.zeros((out_size,), jnp.float32),
    }


class TDNNStack:
    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        dilations: Sequence[int] = (1, 1, 3, 3, 3),
        kernel: int = 3,
        dropout: float = 0.0,
        compute_dtype=jnp.bfloat16,
    ):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.dilations = tuple(dilations)
        self.kernel = kernel
        self.dropout = dropout
        self.compute_dtype = compute_dtype
        self.output_size = hidden_size

    def init(self, key) -> dict:
        layers = []
        for l, _d in enumerate(self.dilations):
            key, sub = jax.random.split(key)
            in_size = self.input_size if l == 0 else self.hidden_size
            layers.append(_conv_init(sub, self.kernel, in_size, self.hidden_size))
        return {"layers": layers}

    def apply(
        self,
        params: dict,
        x: jax.Array,                      # [B, T, D]
        mask: Optional[jax.Array] = None,  # [B, T]
        *,
        train: bool = False,
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        cd = self.compute_dtype
        m = None if mask is None else mask[..., None].astype(jnp.float32)
        for l, (lp, dil) in enumerate(zip(params["layers"], self.dilations)):
            if m is not None:
                x = x * m  # keep padding from leaking through conv context
            pad = (self.kernel - 1) // 2 * dil
            y = jax.lax.conv_general_dilated(
                x.astype(cd),
                lp["w"].astype(cd),
                window_strides=(1,),
                padding=[(pad, pad)],
                rhs_dilation=(dil,),
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32,
            ) + lp["b"]
            y = jax.nn.relu(y)
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
            y = (y - mu) * jax.lax.rsqrt(var + 1e-5) * lp["ln_scale"] + lp["ln_bias"]
            if train and self.dropout > 0.0 and l < len(self.dilations) - 1:
                if dropout_key is None:
                    raise ValueError("dropout enabled but no dropout_key supplied")
                dropout_key, sub = jax.random.split(dropout_key)
                keep = 1.0 - self.dropout
                y = y * jax.random.bernoulli(sub, keep, y.shape) / keep
            x = y
        return x
