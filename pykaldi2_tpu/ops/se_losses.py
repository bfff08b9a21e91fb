"""Sequence-discriminative losses: MMI, sMBR, MPE over dense graphs.

Reference behavior: the SE loss code in pykaldi2/bin/train_se.py wrapping
Kaldi's LatticeForwardBackwardMmi / LatticeForwardBackwardMpeVariants
(SURVEY.md §3.1 "SE loss ops", §4.2): per batch, scaled log-likelihoods
(log-softmax − log-prior) × acoustic_scale feed a denominator decode +
forward-backward; the gradient is (num_post − den_post); MMI supports
drop_frames; sMBR/MPE use frame-accuracy-weighted posteriors.

TPU-native: the denominator is a fixed LF-MMI-style graph, forward-backward
runs on device (ops/fb.py), and the losses are differentiable end-to-end.
The decoded-lattice denominator mode lives in decode/ (host C++ decoder).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.ops.fb import (
    GraphArrays,
    fsa_expected_accuracy,
    fsa_logz,
    fsa_occupancies,
)


def acoustic_scores(logits, log_prior, acoustic_scale):
    """Pseudo-log-likelihoods: ascale * (log-softmax − log-prior)."""
    logpost = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if log_prior is not None:
        logpost = logpost - log_prior
    return acoustic_scale * logpost


# ---------------------------------------------------------------------------
# MMI with fixed numerator alignment (custom VJP so drop_frames can act on
# the gradient exactly like Kaldi's --drop-frames)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6))
def mmi_objective(obs, ali, den_graph: GraphArrays, num_frames, mask,
                  drop_frames: bool = True, den_scale: float = 1.0):
    """Per-sequence MMI objective: logZ_num − den_scale·logZ_den  [B].

    obs: [B, T, P] scaled scores; ali: [B, T] numerator pdf alignment
    (mask==0 frames ignored). The VJP is (num_onehot − den_scale·gamma_den),
    with frames dropped where the numerator pdf has ~zero denominator
    occupancy (Kaldi drop_frames semantics).
    """
    num, den = _mmi_terms(obs, ali, den_graph, num_frames, mask)
    return num - den_scale * den


def _graph_logz(obs, graph, num_frames):
    """Dispatch: structured bigram / dense state-matmul / block-sparse /
    generic arc tables."""
    from pykaldi2_tpu.ops.fb_bigram import BigramDenGraph, bigram_logz
    from pykaldi2_tpu.ops.fb_block import BlockSparseGraph, fsa_logz_block
    from pykaldi2_tpu.ops.fb_dense import DenseStateGraph, fsa_logz_dense

    if isinstance(graph, BigramDenGraph):
        return bigram_logz(obs, graph, num_frames)
    if isinstance(graph, DenseStateGraph):
        return fsa_logz_dense(obs, graph, num_frames)
    if isinstance(graph, BlockSparseGraph):
        return fsa_logz_block(obs, graph, num_frames)
    return fsa_logz(obs, graph, num_frames)


def _graph_occupancies(obs, graph, num_frames):
    from pykaldi2_tpu.ops.fb_bigram import BigramDenGraph, bigram_occupancies
    from pykaldi2_tpu.ops.fb_block import (BlockSparseGraph,
                                           fsa_occupancies_block)
    from pykaldi2_tpu.ops.fb_dense import DenseStateGraph, fsa_occupancies_dense

    if isinstance(graph, BigramDenGraph):
        return bigram_occupancies(obs, graph, num_frames)
    if isinstance(graph, DenseStateGraph):
        return fsa_occupancies_dense(obs, graph, num_frames)
    if isinstance(graph, BlockSparseGraph):
        return fsa_occupancies_block(obs, graph, num_frames)
    return fsa_occupancies(obs, graph, num_frames)


def _mmi_terms(obs, ali, den_graph, num_frames, mask):
    safe = jnp.maximum(ali, 0)
    num = jnp.sum(jnp.take_along_axis(obs, safe[..., None], axis=-1)[..., 0] * mask, axis=-1)
    den = _graph_logz(obs, den_graph, num_frames)
    return num, den


def _mmi_fwd(obs, ali, den_graph, num_frames, mask, drop_frames, den_scale):
    logz_den, gamma_den = _graph_occupancies(obs, den_graph, num_frames)
    safe = jnp.maximum(ali, 0)
    num = jnp.sum(jnp.take_along_axis(obs, safe[..., None], axis=-1)[..., 0] * mask, axis=-1)
    obj = num - den_scale * logz_den
    return obj, (ali, mask, gamma_den)


def _mmi_bwd(den_graph, drop_frames, den_scale, res, ct):
    ali, mask, gamma_den = res
    safe = jnp.maximum(ali, 0)
    num_onehot = jax.nn.one_hot(safe, gamma_den.shape[-1], dtype=jnp.float32)
    grad = num_onehot - den_scale * gamma_den
    m = mask[..., None]
    if drop_frames:
        # drop frames whose numerator pdf is (numerically) absent from the den
        den_at_num = jnp.take_along_axis(gamma_den, safe[..., None], axis=-1)
        keep = (den_at_num > 1e-20).astype(jnp.float32)
        m = m * keep
    grad = grad * m
    return (ct[:, None, None] * grad, None, None, None)


mmi_objective.defvjp(_mmi_fwd, _mmi_bwd)


def mmi_loss(logits, ali, mask, den_graph: GraphArrays, num_frames,
             log_prior=None, acoustic_scale: float = 0.1,
             drop_frames: bool = True, den_scale: float = 1.0):
    """Mean −MMI objective per supervised frame (lower is better).

    Returns (loss, aux) with aux = dict(mmi_obj_per_frame).
    """
    obs = acoustic_scores(logits, log_prior, acoustic_scale)
    obj = mmi_objective(obs, ali, den_graph, num_frames, mask, drop_frames, den_scale)
    frames = jnp.maximum(jnp.sum(mask), 1.0)
    total = jnp.sum(obj)
    return -total / frames, {"mmi_obj_per_frame": total / frames}


# ---------------------------------------------------------------------------
# sMBR / MPE
# ---------------------------------------------------------------------------


def smbr_loss(logits, ref, mask, den_graph: GraphArrays, num_frames,
              log_prior=None, acoustic_scale: float = 0.1, level: str = "pdf",
              silence=None):
    """Mean −E[frame accuracy] per supervised frame.

    level='pdf' → sMBR; level='phone' → MPE/MPFE (ref must then hold phone
    ids and den_graph must carry arc phones). ``silence`` (fb.SilenceOpts)
    applies Kaldi's MpeVariants silence-phone accuracy rules.
    """
    obs = acoustic_scores(logits, log_prior, acoustic_scale)
    f = fsa_expected_accuracy(obs, den_graph, jnp.maximum(ref, 0), num_frames,
                              level, silence)
    frames = jnp.maximum(jnp.sum(mask), 1.0)
    total = jnp.sum(f)
    return -total / frames, {"expected_acc_per_frame": total / frames}


# ---------------------------------------------------------------------------
# Priors
# ---------------------------------------------------------------------------


def priors_from_counts(counts: np.ndarray, floor: float = 1e-10) -> np.ndarray:
    """Label counts → log-prior vector (the CE-stage prior for SE/decoding)."""
    counts = np.asarray(counts, np.float64)
    p = counts / max(counts.sum(), 1.0)
    return np.log(np.maximum(p, floor)).astype(np.float32)


def count_labels(label_iter, num_pdfs: int) -> np.ndarray:
    counts = np.zeros(num_pdfs, np.float64)
    for labels in label_iter:
        labels = np.asarray(labels)
        labels = labels[labels >= 0]
        counts += np.bincount(labels, minlength=num_pdfs)
    return counts
