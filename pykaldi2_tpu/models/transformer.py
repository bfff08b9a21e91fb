"""Transformer acoustic model (encoder-only), optional in the reference era.

SURVEY.md §3.1 notes a Transformer AM may exist in later reference commits;
included for completeness. Pre-LN encoder blocks, bf16 GEMMs, fp32 softmax,
padding masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _dense_init(key, in_size, out_size):
    bound = np.sqrt(1.0 / in_size)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (in_size, out_size), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_size,), jnp.float32, -bound, bound),
    }


def _dense(p, x, cd):
    return jnp.dot(x.astype(cd), p["w"].astype(cd), preferred_element_type=jnp.float32) + p["b"]


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def sinusoidal_positions(t: int, d: int) -> np.ndarray:
    pos = np.arange(t)[:, None]
    i = np.arange(d // 2)[None, :]
    ang = pos / np.power(10000.0, 2 * i / d)
    out = np.zeros((t, d), np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out


class TransformerStack:
    def __init__(
        self,
        input_size: int,
        hidden_size: int = 512,
        num_layers: int = 6,
        num_heads: int = 8,
        ffn_size: int = 2048,
        dropout: float = 0.0,
        compute_dtype=jnp.bfloat16,
    ):
        if hidden_size % num_heads:
            raise ValueError("hidden_size must divide num_heads")
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.ffn_size = ffn_size
        self.dropout = dropout
        self.compute_dtype = compute_dtype
        self.output_size = hidden_size

    def init(self, key) -> dict:
        key, kin = jax.random.split(key)
        params = {"in_proj": _dense_init(kin, self.input_size, self.hidden_size), "layers": []}
        for _ in range(self.num_layers):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            params["layers"].append({
                "qkv": _dense_init(k1, self.hidden_size, 3 * self.hidden_size),
                "out": _dense_init(k2, self.hidden_size, self.hidden_size),
                "ffn1": _dense_init(k3, self.hidden_size, self.ffn_size),
                "ffn2": _dense_init(k4, self.ffn_size, self.hidden_size),
                "ln1_scale": jnp.ones((self.hidden_size,)), "ln1_bias": jnp.zeros((self.hidden_size,)),
                "ln2_scale": jnp.ones((self.hidden_size,)), "ln2_bias": jnp.zeros((self.hidden_size,)),
            })
        return params

    def apply(self, params, x, mask=None, *, train=False, dropout_key=None):
        cd = self.compute_dtype
        B, T, _ = x.shape
        h = _dense(params["in_proj"], x, cd) + jnp.asarray(sinusoidal_positions(T, self.hidden_size))
        nh, hd = self.num_heads, self.hidden_size // self.num_heads
        use_dropout = train and self.dropout > 0.0
        if use_dropout and dropout_key is None:
            raise ValueError("dropout enabled but no dropout_key supplied")

        def drop(v):
            nonlocal dropout_key
            if not use_dropout:
                return v
            dropout_key, sub = jax.random.split(dropout_key)
            keep = 1.0 - self.dropout
            return v * jax.random.bernoulli(sub, keep, v.shape) / keep

        if mask is not None:
            attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30).astype(jnp.float32)
        else:
            attn_bias = None
        for lp in params["layers"]:
            hn = _ln(h, lp["ln1_scale"], lp["ln1_bias"])
            qkv = _dense(lp["qkv"], hn, cd).reshape(B, T, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            logits = jnp.einsum("bthd,bshd->bhts", q.astype(cd), k.astype(cd),
                                preferred_element_type=jnp.float32) / np.sqrt(hd)
            if attn_bias is not None:
                logits = logits + attn_bias
            w = jax.nn.softmax(logits, axis=-1)
            ctx = jnp.einsum("bhts,bshd->bthd", w.astype(cd), v.astype(cd),
                             preferred_element_type=jnp.float32).reshape(B, T, self.hidden_size)
            h = h + drop(_dense(lp["out"], ctx, cd))
            hn = _ln(h, lp["ln2_scale"], lp["ln2_bias"])
            h = h + drop(_dense(lp["ffn2"], jax.nn.relu(_dense(lp["ffn1"], hn, cd)), cd))
        return h
