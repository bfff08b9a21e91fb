"""NnetAM: backbone + output projection over senones; model registry.

Reference behavior: pykaldi2/models/lstm.py ``NnetAM(nnet, hidden_size,
output_size)`` — backbone followed by a Linear producing per-frame senone
logits (SURVEY.md §3.1 "Models").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pykaldi2_tpu.config import ModelConfig
from pykaldi2_tpu.models.lstm import LSTMStack
from pykaldi2_tpu.models.tdnn import TDNNStack
from pykaldi2_tpu.models.transformer import TransformerStack


class NnetAM:
    """Backbone + output linear layer; per-frame senone logits [B, T, C]."""

    def __init__(self, nnet, output_size: int, compute_dtype=jnp.bfloat16):
        self.nnet = nnet
        self.output_size = output_size
        self.compute_dtype = compute_dtype

    def init(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        hidden = self.nnet.output_size
        bound = np.sqrt(1.0 / hidden)
        return {
            "nnet": self.nnet.init(k1),
            "out_w": jax.random.uniform(k2, (hidden, self.output_size), jnp.float32, -bound, bound),
            "out_b": jax.random.uniform(k3, (self.output_size,), jnp.float32, -bound, bound),
        }

    def apply(
        self,
        params: dict,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = self.nnet.apply(params["nnet"], x, mask, train=train, dropout_key=dropout_key)
        cd = self.compute_dtype
        return jnp.dot(h.astype(cd), params["out_w"].astype(cd),
                       preferred_element_type=jnp.float32) + params["out_b"]


def build_model(cfg: ModelConfig) -> NnetAM:
    """ModelConfig → NnetAM with the configured backbone."""
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    bidi = cfg.bidirectional or cfg.type == "blstm"
    if cfg.type in ("lstm", "blstm"):
        nnet = LSTMStack(
            cfg.input_size, cfg.hidden_size, cfg.num_layers,
            dropout=cfg.dropout, bidirectional=bidi, proj_size=cfg.proj_size,
            compute_dtype=cd,
        )
    elif cfg.type == "tdnn":
        nnet = TDNNStack(
            cfg.input_size, cfg.hidden_size, dilations=cfg.tdnn_dilations,
            kernel=cfg.tdnn_kernel, dropout=cfg.dropout, compute_dtype=cd,
        )
    elif cfg.type == "transformer":
        nnet = TransformerStack(
            cfg.input_size, cfg.hidden_size, cfg.num_layers, cfg.num_heads,
            cfg.ffn_size, dropout=cfg.dropout, compute_dtype=cd,
        )
    else:
        raise ValueError(f"unknown model type {cfg.type!r}")
    return NnetAM(nnet, cfg.output_size, compute_dtype=cd)
