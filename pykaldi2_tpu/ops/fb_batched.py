"""Forward-backward over PER-UTTERANCE graphs (batched arc tables).

The shared-graph kernels in ops/fb.py cover the fixed-denominator hot path;
this module covers per-utterance graphs — decoded denominator lattices (the
reference's on-the-fly mode, SURVEY.md §4.2) and transcript numerator graphs.
Graphs are padded to a common (num_arcs, num_states) bucket so each bucket
shape compiles once; padding arcs carry -inf weights and are exact no-ops
(tested).

Indexing differences vs fb.py: gathers become take_along_axis over the batch
dim and segment reductions run over a flattened (batch x state) id space.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.ops.fsa import DenseFsa
from pykaldi2_tpu.ops.fb import NEG_INF, frame_accuracy


class BatchedGraphs(NamedTuple):
    src: jax.Array      # [B, E] int32
    dst: jax.Array      # [B, E] int32
    pdf: jax.Array      # [B, E] int32
    weight: jax.Array   # [B, E] f32 (NEG_INF on padding arcs)
    final: jax.Array    # [B, S] f32

    @property
    def num_states(self) -> int:  # static: derived from the padded shape
        return self.final.shape[1]


def _round_bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def pack_graph_batch(fsas: List[DenseFsa], bucket: bool = True) -> BatchedGraphs:
    """Pad per-utt graphs to a common (power-of-two) arc/state budget."""
    e_max = max(f.num_arcs for f in fsas)
    s_max = max(f.num_states for f in fsas)
    if bucket:
        e_max, s_max = _round_bucket(e_max), _round_bucket(s_max)
    padded = [f.pad_to(e_max, s_max) for f in fsas]
    clean = lambda a: np.nan_to_num(np.stack(a), neginf=NEG_INF, posinf=NEG_INF)
    for f in padded:
        if f.start != 0:
            raise ValueError("batched graphs must start at state 0")
    return BatchedGraphs(
        src=jnp.asarray(np.stack([f.src for f in padded])),
        dst=jnp.asarray(np.stack([f.dst for f in padded])),
        pdf=jnp.asarray(np.stack([f.pdf for f in padded])),
        weight=jnp.asarray(clean([f.weight for f in padded]).astype(np.float32)),
        final=jnp.asarray(clean([f.final for f in padded]).astype(np.float32)),
    )


def _gather_state(x, idx):
    """x [B, S], idx [B, E] → [B, E]."""
    return jnp.take_along_axis(x, idx, axis=1)


def _seg_sum_b(values, ids, num_states):
    """values [B, E], ids [B, E] → [B, S] scatter-add per batch row."""
    b = values.shape[0]
    offs = jnp.arange(b, dtype=ids.dtype)[:, None] * num_states
    flat = jax.ops.segment_sum(values.reshape(-1), (ids + offs).reshape(-1),
                               num_segments=b * num_states)
    return flat.reshape(b, num_states)


def _alpha0(g: BatchedGraphs, like):
    b = g.src.shape[0]
    a = jnp.full((b, g.num_states), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    return a + 0.0 * jnp.sum(like * 0.0)


def _logz_fwd_scan_b(obs, g: BatchedGraphs, num_frames):
    b, t_len, _ = obs.shape

    def step(carry, inp):
        alpha, norm = carry
        obs_t, t = inp
        score = (_gather_state(alpha, g.src) + g.weight
                 + jnp.take_along_axis(obs_t, g.pdf, axis=1))
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        summed = _seg_sum_b(lin, g.dst, g.num_states)
        new_alpha = jnp.where(summed > 0, jnp.log(jnp.where(summed > 0, summed, 1.0)), NEG_INF) + mx
        m2 = jnp.max(new_alpha, axis=1, keepdims=True)
        new_alpha = new_alpha - m2
        new_norm = norm + m2[:, 0]
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        norm = jnp.where(active[:, 0], new_norm, norm)
        return (alpha, norm), (alpha, norm)

    alpha0 = _alpha0(g, obs)
    obs_t = jnp.swapaxes(obs, 0, 1)
    ts = jnp.arange(t_len)
    (alpha_T, norm_T), (alphas, norms) = jax.lax.scan(
        step, (alpha0, jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]), (obs_t, ts))
    total = jnp.maximum(alpha_T + g.final, NEG_INF)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return logz, (alphas, norms)


@jax.custom_vjp
def fsa_logz_b(obs, graphs: BatchedGraphs, num_frames):
    """Per-sequence log partition over per-utterance graphs: [B]."""
    return _logz_fwd_scan_b(obs, graphs, num_frames)[0]


def _fsa_logz_b_fwd(obs, graphs, num_frames):
    logz, (alphas, norms) = _logz_fwd_scan_b(obs, graphs, num_frames)
    return logz, (obs, graphs, num_frames, logz, alphas, norms)


def _fsa_logz_b_bwd(res, ct):
    obs, g, num_frames, logz, alphas, norms = res
    gamma = _occupancies_b(obs, g, num_frames, logz, alphas, norms)
    return (ct[:, None, None] * gamma, None, None)


def _occupancies_b(obs, g: BatchedGraphs, num_frames, logz, alphas, norms):
    b, t_len, p_dim = obs.shape
    beta0 = g.final + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]
    alpha_prev = jnp.concatenate([_alpha0(g, obs)[None], alphas[:-1]], axis=0)
    anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32), norms[:-1]], axis=0)

    def step(carry, inp):
        beta, bnorm = carry
        obs_t, a_prev, an_prev, t = inp
        obs_arc = jnp.take_along_axis(obs_t, g.pdf, axis=1)
        score = g.weight + obs_arc + _gather_state(beta, g.dst)
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        summed = _seg_sum_b(lin, g.src, g.num_states)
        new_beta = jnp.where(summed > 0, jnp.log(jnp.where(summed > 0, summed, 1.0)), NEG_INF) + mx
        m2 = jnp.max(new_beta, axis=1, keepdims=True)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        log_gamma = (_gather_state(a_prev, g.src) + an_prev[:, None] + g.weight + obs_arc
                     + _gather_state(beta, g.dst) + bnorm[:, None] - logz[:, None])
        gamma_arc = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_arc = jnp.where(active, gamma_arc, 0.0)
        gamma_t = _seg_sum_b(gamma_arc, g.pdf, p_dim)
        beta = jnp.where(active, new_beta_n, beta)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bnorm), gamma_t

    obs_t = jnp.swapaxes(obs, 0, 1)
    ts = jnp.arange(t_len)
    _, gammas = jax.lax.scan(step, (beta0, bnorm0),
                             (obs_t, alpha_prev, anorm_prev, ts), reverse=True)
    return jnp.swapaxes(gammas, 0, 1)


fsa_logz_b.defvjp(_fsa_logz_b_fwd, _fsa_logz_b_bwd)


def fsa_occupancies_b(obs, graphs: BatchedGraphs, num_frames):
    logz, (alphas, norms) = _logz_fwd_scan_b(obs, graphs, num_frames)
    gamma = _occupancies_b(obs, graphs, num_frames, logz, alphas, norms)
    return logz, gamma


# ---------------------------------------------------------------------------
# MMI over decoded lattices (per-utt den graphs)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def mmi_objective_lattice(obs, ali, den: BatchedGraphs, num_frames, mask,
                          drop_frames: bool = True, den_scale: float = 1.0):
    """MMI with per-utterance denominator lattices: [B] objectives."""
    safe = jnp.maximum(ali, 0)
    num = jnp.sum(jnp.take_along_axis(obs, safe[..., None], axis=-1)[..., 0] * mask, axis=-1)
    den_lz = fsa_logz_b(obs, den, num_frames)
    return num - den_scale * den_lz


def _mmi_lat_fwd(obs, ali, den, num_frames, mask, drop_frames, den_scale):
    logz, gamma = fsa_occupancies_b(obs, den, num_frames)
    safe = jnp.maximum(ali, 0)
    num = jnp.sum(jnp.take_along_axis(obs, safe[..., None], axis=-1)[..., 0] * mask, axis=-1)
    return num - den_scale * logz, (ali, mask, gamma)


def _mmi_lat_bwd(drop_frames, den_scale, res, ct):
    ali, mask, gamma = res
    safe = jnp.maximum(ali, 0)
    num_onehot = jax.nn.one_hot(safe, gamma.shape[-1], dtype=jnp.float32)
    grad = num_onehot - den_scale * gamma
    m = mask[..., None]
    if drop_frames:
        den_at_num = jnp.take_along_axis(gamma, safe[..., None], axis=-1)
        m = m * (den_at_num > 1e-20).astype(jnp.float32)
    return (ct[:, None, None] * grad * m, None, None, None, None)


mmi_objective_lattice.defvjp(_mmi_lat_fwd, _mmi_lat_bwd)


# ---------------------------------------------------------------------------
# Expected accuracy (sMBR / MPE) over decoded per-utterance lattices
# ---------------------------------------------------------------------------
#
# Mirrors ops/fb.fsa_expected_accuracy (double forward-backward carrying the
# expected accumulated accuracy alongside alpha/beta; gradient = gamma *
# (E[acc | arc] − E[acc]), Kaldi LatticeForwardBackwardMpeVariants semantics)
# with per-utterance arc tables. Phone-level (MPE/MPFE) accuracy maps arc
# pdfs through pdf_to_phone since decoded lattices label arcs by pdf.


def _arc_acc_b(pdf, ref_t, level: str, pdf_to_phone, silence=None):
    """[B, E] per-arc frame accuracy of arc labels ``pdf`` vs ref_t [B].

    Shared with the banded time-sync kernels (ops/fb_lattice.py).
    ``silence`` applies Kaldi's MpeVariants silence rules (fb.SilenceOpts).
    """
    if level == "pdf":
        lab = pdf
    elif level == "phone":
        if pdf_to_phone is None:
            raise ValueError("level='phone' needs pdf_to_phone")
        lab = pdf_to_phone[jnp.maximum(pdf, 0)]
    else:
        raise ValueError(level)
    return frame_accuracy(lab, ref_t[:, None], level, silence)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6))
def batched_expected_accuracy(obs, graphs: BatchedGraphs, ref, num_frames,
                              level: str = "pdf", pdf_to_phone=None,
                              silence=None):
    """E[#correct frames] under each utterance's lattice posterior: [B].

    ref: [B, T] reference pdf (level='pdf') or phone (level='phone') ids.
    ``silence`` applies Kaldi's MpeVariants silence rules (fb.SilenceOpts).
    """
    f, _ = _smbr_fwd_scan_b(obs, graphs, ref, num_frames, level, pdf_to_phone,
                            silence)
    return f


def _smbr_fwd_scan_b(obs, g: BatchedGraphs, ref, num_frames, level,
                     pdf_to_phone, silence=None):
    b, t_len, _ = obs.shape
    alpha0 = _alpha0(g, obs)
    acc0 = jnp.zeros((b, g.num_states), jnp.float32) + 0.0 * alpha0

    def step(carry, inp):
        alpha, aacc, norm = carry
        obs_t, ref_t, t = inp
        score = (_gather_state(alpha, g.src) + g.weight
                 + jnp.take_along_axis(obs_t, g.pdf, axis=1))               # [B, E]
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        arc_acc = _arc_acc_b(g.pdf, ref_t, level, pdf_to_phone, silence)
        acc_in = _gather_state(aacc, g.src) + arc_acc
        denom = _seg_sum_b(lin, g.dst, g.num_states)
        numer = _seg_sum_b(lin * acc_in, g.dst, g.num_states)
        new_alpha = jnp.where(denom > 0, jnp.log(jnp.where(denom > 0, denom, 1.0)), NEG_INF) + mx
        new_acc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.max(new_alpha, axis=1, keepdims=True)
        new_alpha = new_alpha - m2
        new_norm = norm + m2[:, 0]
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        aacc = jnp.where(active, new_acc, aacc)
        norm = jnp.where(active[:, 0], new_norm, norm)
        return (alpha, aacc, norm), (alpha, aacc, norm)

    obs_t = jnp.swapaxes(obs, 0, 1)
    ref_t = jnp.swapaxes(ref, 0, 1)
    ts = jnp.arange(t_len)
    (alpha_T, acc_T, norm_T), (alphas, aaccs, norms) = jax.lax.scan(
        step, (alpha0, acc0, jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]),
        (obs_t, ref_t, ts))
    total = jnp.maximum(alpha_T + g.final, NEG_INF)
    w = jax.nn.softmax(total, axis=1)
    f = jnp.sum(w * acc_T, axis=1)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return f, (alphas, aaccs, norms, logz, f)


def _smbr_b_fwd(obs, graphs, ref, num_frames, level, pdf_to_phone, silence):
    f, res = _smbr_fwd_scan_b(obs, graphs, ref, num_frames, level,
                              pdf_to_phone, silence)
    return f, (obs, graphs, ref, num_frames, pdf_to_phone) + res


def _smbr_b_bwd(level, silence, res, ct):
    obs, g, ref, num_frames, pdf_to_phone, alphas, aaccs, norms, logz, f = res
    b, t_len, p_dim = obs.shape

    beta0 = g.final + 0.0 * alphas[0]
    bacc0 = jnp.zeros((b, g.num_states), jnp.float32) + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]
    alpha_prev = jnp.concatenate([_alpha0(g, obs)[None], alphas[:-1]], axis=0)
    aacc_prev = jnp.concatenate([jnp.zeros((1, b, g.num_states), jnp.float32), aaccs[:-1]], axis=0)
    anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32), norms[:-1]], axis=0)

    def step(carry, inp):
        beta, bacc, bnorm = carry
        obs_t, ref_t, a_prev, aa_prev, an_prev, t = inp
        arc_acc = _arc_acc_b(g.pdf, ref_t, level, pdf_to_phone, silence)
        obs_arc = jnp.take_along_axis(obs_t, g.pdf, axis=1)
        log_gamma = (_gather_state(a_prev, g.src) + an_prev[:, None] + g.weight
                     + obs_arc + _gather_state(beta, g.dst) + bnorm[:, None]
                     - logz[:, None])
        gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
        c_arc = _gather_state(aa_prev, g.src) + arc_acc + _gather_state(bacc, g.dst)
        contrib = gamma * (c_arc - f[:, None])
        active = (t < num_frames)[:, None]
        contrib = jnp.where(active, contrib, 0.0)
        grad_t = _seg_sum_b(contrib, g.pdf, p_dim)
        score = g.weight + obs_arc + _gather_state(beta, g.dst)
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        acc_out = arc_acc + _gather_state(bacc, g.dst)
        denom = _seg_sum_b(lin, g.src, g.num_states)
        numer = _seg_sum_b(lin * acc_out, g.src, g.num_states)
        new_beta = jnp.where(denom > 0, jnp.log(jnp.where(denom > 0, denom, 1.0)), NEG_INF) + mx
        new_bacc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.max(new_beta, axis=1, keepdims=True)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        beta = jnp.where(active, new_beta_n, beta)
        bacc = jnp.where(active, new_bacc, bacc)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bacc, bnorm), grad_t

    obs_t = jnp.swapaxes(obs, 0, 1)
    ref_t = jnp.swapaxes(ref, 0, 1)
    ts = jnp.arange(t_len)
    _, grads = jax.lax.scan(
        step, (beta0, bacc0, bnorm0),
        (obs_t, ref_t, alpha_prev, aacc_prev, anorm_prev, ts), reverse=True)
    grad = jnp.swapaxes(grads, 0, 1)
    return (ct[:, None, None] * grad, None, None, None, None)


batched_expected_accuracy.defvjp(_smbr_b_fwd, _smbr_b_bwd)
