"""On-device feature pipeline: waveform batch → normalized features, under jit.

This is the TPU-native fusion point (BASELINE.json: front end as device
kernels "producing HBM-resident batches"): the trainer's jitted step calls
this on the raw waveform batch, so framing/DFT/mel/CMVN/deltas/splicing fuse
with the model's forward pass in one XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import FeatConfig
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.frontend import (
    add_deltas,
    apply_cmvn,
    compute_fbank,
    compute_mfcc,
    splice_frames,
    utterance_cmvn,
)
from pykaldi2_tpu.frontend.cmvn import cmvn_mean_std


def base_feature_dim(cfg: FeatConfig) -> int:
    if cfg.type == "fbank":
        return cfg.fbank.mel_opts.num_bins + (1 if cfg.fbank.use_energy else 0)
    if cfg.type == "mfcc":
        return cfg.mfcc.num_ceps
    raise ValueError(f"unknown feature type {cfg.type!r}")


def feature_dim(cfg: FeatConfig) -> int:
    """Final model input dim after deltas and splicing."""
    d = base_feature_dim(cfg) * (cfg.delta_order + 1)
    return d * (cfg.splice_left + 1 + cfg.splice_right)


def save_cmvn_stats(path: str, stats: np.ndarray):
    """Write [2, D+1] stats as a Kaldi binary double-matrix file."""
    with open(path, "wb") as f:
        f.write(kaldi_io.BINARY_MARKER)
        kaldi_io.write_matrix(f, np.asarray(stats, np.float64))


def load_cmvn_stats(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        marker = f.read(2)
        if marker != kaldi_io.BINARY_MARKER:
            raise ValueError(f"{path} is not a binary Kaldi matrix")
        return kaldi_io.read_matrix(f)


class FeaturePipeline:
    """Configured wave/feats batch → model-input features, jit-friendly.

    Call with a batch dict (``wave`` [B,S] or ``feats`` [B,T,D]) and the frame
    ``mask`` [B,T]; returns [B, T, feature_dim] fp32.
    """

    def __init__(self, cfg: FeatConfig, cmvn_stats: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.mean = None
        self.scale = None
        if cfg.cmvn.stats_path and cmvn_stats is None:
            cmvn_stats = load_cmvn_stats(cfg.cmvn.stats_path)
        if cmvn_stats is not None:
            self.mean, self.scale = cmvn_mean_std(cmvn_stats, cfg.cmvn.norm_vars)
        self.dim = feature_dim(cfg)

    def for_eval(self) -> "FeaturePipeline":
        """Deterministic copy for eval/alignment/stats paths: dither off.

        (The reference dithers at eval too via Kaldi defaults; here eval is
        deterministic by design — dither only runs in training steps, which
        pass a PRNG key.)"""
        import copy

        out = copy.copy(self)  # shallow: shares stats, swaps config
        out.cfg = copy.deepcopy(self.cfg)
        out.cfg.fbank.frame_opts.dither = 0.0
        out.cfg.mfcc.frame_opts.dither = 0.0
        return out

    @staticmethod
    def _pallas_enabled(env_var: str = "PK2_PALLAS_FBANK") -> bool:
        """Env override wins; otherwise fused kernels default to TPU only."""
        import os

        env = os.environ.get(env_var)
        if env is not None:
            return env not in ("0", "false", "")
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _use_fused(self, dither_key) -> bool:
        """Pallas fused fbank kernel for the standard log-power fbank path;
        dithered batches fall back to the XLA path (the kernel has no PRNG)."""
        fb = self.cfg.fbank
        if fb.frame_opts.dither != 0.0 or fb.use_energy \
                or not fb.use_log_fbank or not fb.use_power:
            return False
        return self._pallas_enabled()

    def _use_fused_mfcc(self) -> bool:
        mf = self.cfg.mfcc
        if mf.frame_opts.dither != 0.0 or (mf.use_energy and not mf.raw_energy):
            return False
        return self._pallas_enabled()

    def __call__(self, batch: dict, dither_key=None) -> jax.Array:
        cfg = self.cfg
        if "feats" in batch:
            feats = batch["feats"].astype(jnp.float32)
        elif cfg.type == "fbank":
            if self._use_fused(dither_key):
                from pykaldi2_tpu.frontend.fused import fused_fbank

                feats = fused_fbank(batch["wave"], cfg.fbank)
            else:
                feats = compute_fbank(batch["wave"], cfg.fbank, dither_key=dither_key)
        elif self._use_fused_mfcc():
            from pykaldi2_tpu.frontend.fused import fused_mfcc

            feats = fused_mfcc(batch["wave"], cfg.mfcc)
        else:
            feats = compute_mfcc(batch["wave"], cfg.mfcc, dither_key=dither_key)
        mask = batch.get("mask")
        if self.mean is not None:
            feats = apply_cmvn(feats, jnp.asarray(self.mean), jnp.asarray(self.scale),
                               cfg.cmvn.norm_means)
        elif cfg.cmvn.norm_means:
            feats = utterance_cmvn(feats, cfg.cmvn.norm_vars, mask=mask)
        if cfg.delta_order > 0:
            feats = add_deltas(feats, cfg.delta_order, cfg.delta_window)
        if cfg.splice_left or cfg.splice_right:
            feats = splice_frames(feats, cfg.splice_left, cfg.splice_right)
        return feats
