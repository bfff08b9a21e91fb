"""Generic-graph forward-backward as dense MXU matmuls (state-emission form).

SURVEY.md §8 hard-part-1, implemented the TPU way. Every graph our compilers
emit (graph/compile.py `_expand`) has a key invariant: **all arcs into a
state carry that state's pdf** (emission sits on the destination state, as in
Kaldi's H). The per-arc observation term then factorizes out of the
logsumexp, and the alpha recursion collapses to

    alpha'[d] = obs_t[pdf(d)] + log( (exp(alpha) @ W)[d] )        W[s, d] = e^{w(s→d)}

— a [B,S]x[S,S] GEMM in exp space (running per-step renormalization keeps
exp(alpha) ≤ 1, and static graph weights make W a constant), plus elementwise
work. The arc-table kernel's per-frame O(E) gathers/scatters (1.1 s/step on
the 79k-arc den graph; a degree-padded gather variant measured 4.3x WORSE)
become MXU work: ~50x faster measured on one v5e chip.

The matrix is dense [S, S] fp32, so this path is gated on S (default ≤ 16k
states ≈ 1 GB); `pack_graph_auto` falls back to the arc-table kernels above
that, or when the state-emission invariant does not hold (e.g. hand-built
FSAs with mixed-pdf in-arcs).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.ops.fb import NEG_INF, SilenceOpts, frame_accuracy
from pykaldi2_tpu.ops.fsa import DenseFsa


def _gemm_precision():
    """MXU precision for the FB GEMMs, read at TRACE time so tests/drivers
    can set the env after import. Default HIGH (bf16x3 passes): measured
    1.54x over HIGHEST with ≤2e-4 absolute gamma/grad error — negligible
    against SE training noise. PK2_FB_DENSE_PRECISION=highest|high|default
    overrides (the front end's HIGHEST rule is about bit parity of features;
    these kernels have tolerance-level contracts). On CPU all settings are
    exact fp32, so CPU parity tests stay tight.
    """
    import os

    name = os.environ.get("PK2_FB_DENSE_PRECISION", "high").lower()
    table = {"highest": jax.lax.Precision.HIGHEST,
             "high": jax.lax.Precision.HIGH,
             "default": jax.lax.Precision.DEFAULT}
    if name not in table:
        raise ValueError(f"PK2_FB_DENSE_PRECISION={name!r}: expected one of "
                         f"{sorted(table)}")
    return table[name]


class DenseStateGraph(NamedTuple):
    """Dense exp-weight transition matrix + per-state pdf labels."""

    w_exp: jax.Array       # [S, S] f32, e^{graph weight}, 0 = no arc
    state_pdf: jax.Array   # [S] int32 pdf emitted by arcs INTO each state
    final: jax.Array       # [S] f32 log-prob
    start: int
    num_states: int
    state_phone: Optional[jax.Array] = None  # [S] int32 (MPE/MPFE accuracy)


def state_emission_pdfs(fsa: DenseFsa) -> Optional[np.ndarray]:
    """Per-state pdf if every arc into a state shares one pdf, else None."""
    S = int(fsa.num_states)
    dst = np.asarray(fsa.dst)
    pdf = np.asarray(fsa.pdf)
    state_pdf = np.full(S, -1, np.int64)
    state_pdf[dst] = pdf          # last write per state wins...
    if np.any(state_pdf[dst] != pdf):   # ...then every arc must agree
        return None
    # states with no in-arcs (start) emit nothing; pdf slot unused → 0
    state_pdf[state_pdf < 0] = 0
    return state_pdf.astype(np.int32)


def pack_graph_dense(fsa: DenseFsa) -> DenseStateGraph:
    fsa.validate()
    state_pdf = state_emission_pdfs(fsa)
    if state_pdf is None:
        raise ValueError("graph violates the state-emission invariant "
                         "(arcs into one state carry different pdfs)")
    state_phone = None
    if fsa.phone is not None:
        # same invariant holds for phones in compiler-emitted graphs
        dst = np.asarray(fsa.dst)
        ph = np.asarray(fsa.phone)
        sp = np.full(int(fsa.num_states), -1, np.int64)
        sp[dst] = ph
        if not np.any(sp[dst] != ph):
            sp[sp < 0] = 0
            state_phone = jnp.asarray(sp.astype(np.int32))
    S = int(fsa.num_states)
    w = np.nan_to_num(np.asarray(fsa.weight, np.float64),
                      neginf=NEG_INF, posinf=NEG_INF)
    w_exp = np.zeros((S, S), np.float32)
    # duplicate arcs between the same state pair add in prob space (their
    # logsumexp), which the accumulation here performs exactly; -inf /
    # padding arcs contribute exactly zero. exp computed in float64 so very
    # negative legitimate weights underflow toward 0 faithfully instead of
    # being clamped (round-2 review); only the positive side is clamped to
    # keep the fp32 cast finite.
    probs = np.where(w <= 0.5 * NEG_INF, 0.0, np.exp(np.minimum(w, 80.0)))
    np.add.at(w_exp, (np.asarray(fsa.src), np.asarray(fsa.dst)),
              probs.astype(np.float32))
    final = np.nan_to_num(np.asarray(fsa.final, np.float64),
                          neginf=NEG_INF, posinf=NEG_INF)
    return DenseStateGraph(jnp.asarray(w_exp), jnp.asarray(state_pdf),
                           jnp.asarray(final, jnp.float32),
                           int(fsa.start), S, state_phone)


def pack_graph_auto(fsa: DenseFsa, num_pdfs: Optional[int] = None,
                    max_states: int = 16384):
    """Route by state count: dense state-matmul (≤ max_states), block-sparse
    tiles above that (ops/fb_block.py — O(nnz-blocks) MXU work, O(√T)
    activation memory), generic arc tables as the last resort (invariant
    violations, degenerate block structure).

    num_pdfs is accepted for API stability (the dense form needs only
    per-state pdfs; obs width comes from the observations themselves).
    """
    from pykaldi2_tpu.ops.fb import pack_graph

    if state_emission_pdfs(fsa) is not None:
        if fsa.num_states <= max_states:
            return pack_graph_dense(fsa)
        from pykaldi2_tpu.ops.fb_block import pack_graph_blocks

        try:
            return pack_graph_blocks(fsa)
        except ValueError:
            pass  # degenerate block structure → arc tables
    return pack_graph(fsa)


def _alpha_init_d(g: DenseStateGraph, batch: int, like: jax.Array):
    a = jnp.full((batch, g.num_states), NEG_INF, jnp.float32)
    a = a.at[:, g.start].set(0.0)
    return a + 0.0 * jnp.sum(like * 0.0)


def _log_matvec(x_log, w_exp):
    """[B, S] log-values → log(exp(x) @ w_exp), NEG_INF-safe.

    Caller keeps x_log ≤ 0 via running renormalization, so exp never
    overflows; GEMM precision per _gemm_precision (never silent plain bf16).
    """
    lin = jnp.exp(jnp.maximum(x_log, NEG_INF))
    s = jnp.dot(lin, w_exp, precision=_gemm_precision())
    return jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)), NEG_INF)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fsa_logz_dense(obs: jax.Array, graph: DenseStateGraph, num_frames: jax.Array) -> jax.Array:
    """log partition per batch element: [B] (dense-matmul recursion)."""
    logz, _ = _logz_fwd_scan_d(obs, graph, num_frames)
    return logz


def _gather_obs_d(obs, g: DenseStateGraph):
    """[B, T, num_pdfs] → per-state obs [T, B, S] once, OUTSIDE the scans.

    The per-step jnp.take from the full [B, num_pdfs] frame reads the whole
    observation row from HBM every sequential iteration (same fix as
    fb_bigram._gather_obs / fb_lattice._obs_arcs_ts).  Costs a transient
    [T, B, S] buffer — bounded by pack_graph_auto's 16k-state cap, and the
    forward already stacks [T, B, S] alphas of the same size."""
    return jnp.swapaxes(obs[:, :, g.state_pdf], 0, 1)


def _logz_fwd_scan_d(obs, g: DenseStateGraph, num_frames):
    b, t_len, _p = obs.shape
    alpha0 = _alpha_init_d(g, b, obs)

    def step(carry, inp):
        alpha, norm = carry
        obs_s, t = inp
        new_alpha = _log_matvec(alpha, g.w_exp) + obs_s
        m2 = jnp.max(new_alpha, axis=1, keepdims=True)
        m2 = jnp.maximum(m2, NEG_INF)
        new_alpha = new_alpha - m2
        new_norm = norm + m2[:, 0]
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        norm = jnp.where(active[:, 0], new_norm, norm)
        return (alpha, norm), (alpha, norm)

    obs_s = _gather_obs_d(obs, g)
    ts = jnp.arange(t_len)
    (alpha_T, norm_T), (alphas, norms) = jax.lax.scan(
        step, (alpha0, jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]), (obs_s, ts))
    total = alpha_T + g.final[None, :]
    logz = jax.nn.logsumexp(jnp.maximum(total, NEG_INF), axis=1) + norm_T
    return logz, (alphas, norms)


def _fsa_logz_d_fwd(obs, graph, num_frames):
    logz, (alphas, norms) = _logz_fwd_scan_d(obs, graph, num_frames)
    return logz, (obs, num_frames, logz, alphas, norms)


def _fsa_logz_d_bwd(graph, res, ct):
    obs, num_frames, logz, alphas, norms = res
    gamma = _occupancies_d(obs, graph, num_frames, logz, alphas, norms)
    return (ct[:, None, None] * gamma, None)


def _occupancies_d(obs, g: DenseStateGraph, num_frames, logz, alphas, norms):
    """gamma [B, T, P]: state posterior (alpha·beta/Z) scattered by state pdf
    — an O(S) segment sum, 15x fewer elements than the arc-level scatter."""
    b, t_len, p_dim = obs.shape
    beta0 = jnp.broadcast_to(g.final[None, :], (b, g.num_states)) + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]
    w_exp_t = g.w_exp.T

    def step(carry, inp):
        beta, bnorm = carry
        obs_s, alpha_t, anorm_t, t = inp
        # state posterior at frame t: alpha (through t) · beta (after t)
        log_gamma = (alpha_t + anorm_t[:, None] + beta + bnorm[:, None]
                     - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        # beta recursion: beta'[s] = lse_d(w(s→d) + obs_t[pdf(d)] + beta[d])
        y = obs_s + beta
        m = jnp.max(y, axis=1, keepdims=True)
        m = jnp.maximum(m, NEG_INF)
        new_beta = _log_matvec(y - m, w_exp_t) + m
        m2 = jnp.max(new_beta, axis=1, keepdims=True)
        m2 = jnp.maximum(m2, NEG_INF)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        beta = jnp.where(active, new_beta_n, beta)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bnorm), gamma_s

    obs_s = _gather_obs_d(obs, g)
    ts = jnp.arange(t_len)
    _, gammas_s = jax.lax.scan(
        step, (beta0, bnorm0), (obs_s, alphas, norms, ts), reverse=True)
    # state→pdf scatter as ONE batched segment-sum after the scan (parallel
    # in T) instead of a per-iteration [B, num_pdfs] scatter + HBM write
    s_dim = gammas_s.shape[2]
    gammas = jax.vmap(
        lambda row: jax.ops.segment_sum(row, g.state_pdf, num_segments=p_dim)
    )(gammas_s.reshape(t_len * b, s_dim)).reshape(t_len, b, p_dim)
    return jnp.swapaxes(gammas, 0, 1)


fsa_logz_dense.defvjp(_fsa_logz_d_fwd, _fsa_logz_d_bwd)


def fsa_occupancies_dense(obs, graph: DenseStateGraph, num_frames):
    logz, (alphas, norms) = _logz_fwd_scan_d(obs, graph, num_frames)
    gamma = _occupancies_d(obs, graph, num_frames, logz, alphas, norms)
    return logz, gamma


# ---------------------------------------------------------------------------
# Expected accuracy (sMBR / MPE) in dense state-matmul form
# ---------------------------------------------------------------------------
#
# The accuracy recursion factorizes per state exactly like the emission: the
# per-arc accuracy is A_t[dst] = (label(dst) == ref_t), so the expected
# incoming accuracy is (exp(alpha)·aacc @ W) / (exp(alpha) @ W) + A_t — two
# extra GEMMs per frame. The gradient needs no per-arc work either: the
# gamma-weighted E[acc | arc] grouped by destination state collapses to
# gamma_state · (aacc_t + bacc_t − F), scattered by state pdf.


def _state_labels(g: DenseStateGraph, level: str):
    if level == "pdf":
        return g.state_pdf
    if level == "phone":
        if g.state_phone is None:
            raise ValueError("graph has no phone labels; cannot do phone-level accuracy")
        return g.state_phone
    raise ValueError(level)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def fsa_expected_accuracy_dense(obs, graph: DenseStateGraph, ref, num_frames,
                                level: str = "pdf",
                                silence: Optional[SilenceOpts] = None):
    """E[#correct frames] under the graph posterior: [B] (dense form).

    ``silence`` applies Kaldi's MpeVariants silence-phone rules (fb.SilenceOpts).
    """
    f, _ = _smbr_fwd_scan_dense(obs, graph, ref, num_frames, level, silence)
    return f


def _smbr_fwd_scan_dense(obs, g: DenseStateGraph, ref, num_frames, level,
                         silence=None):
    b, t_len, _p = obs.shape
    lab = _state_labels(g, level)
    alpha0 = _alpha_init_d(g, b, obs)
    acc0 = jnp.zeros((b, g.num_states), jnp.float32) + 0.0 * alpha0

    def step(carry, inp):
        alpha, aacc, norm = carry
        obs_s, ref_t, t = inp
        ea = jnp.exp(jnp.maximum(alpha, NEG_INF))
        denom = jnp.dot(ea, g.w_exp, precision=_gemm_precision())
        numer = jnp.dot(ea * aacc, g.w_exp, precision=_gemm_precision())
        a_t = frame_accuracy(lab[None, :], ref_t[:, None], level, silence)
        new_alpha = (jnp.where(denom > 0, jnp.log(jnp.where(denom > 0, denom, 1.0)),
                               NEG_INF)
                     + obs_s)
        new_acc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0) + a_t
        m2 = jnp.max(new_alpha, axis=1, keepdims=True)
        m2 = jnp.maximum(m2, NEG_INF)
        new_alpha = new_alpha - m2
        new_norm = norm + m2[:, 0]
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        aacc = jnp.where(active, new_acc, aacc)
        norm = jnp.where(active[:, 0], new_norm, norm)
        return (alpha, aacc, norm), (alpha, aacc, norm)

    obs_s = _gather_obs_d(obs, g)
    ref_t = jnp.swapaxes(ref, 0, 1)
    ts = jnp.arange(t_len)
    (alpha_T, acc_T, norm_T), (alphas, aaccs, norms) = jax.lax.scan(
        step, (alpha0, acc0, jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]),
        (obs_s, ref_t, ts))
    total = jnp.maximum(alpha_T + g.final[None, :], NEG_INF)
    w = jax.nn.softmax(total, axis=1)
    f = jnp.sum(w * acc_T, axis=1)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return f, (alphas, aaccs, norms, logz, f)


def _smbr_dense_fwd(obs, graph, ref, num_frames, level, silence):
    f, res = _smbr_fwd_scan_dense(obs, graph, ref, num_frames, level, silence)
    return f, (obs, ref, num_frames) + res


def _smbr_dense_bwd(graph, level, silence, res, ct):
    g = graph
    obs, ref, num_frames, alphas, aaccs, norms, logz, f = res
    b, t_len, p_dim = obs.shape
    lab = _state_labels(g, level)
    w_exp_t = g.w_exp.T

    beta0 = jnp.broadcast_to(g.final[None, :], (b, g.num_states)) + 0.0 * alphas[0]
    bacc0 = jnp.zeros((b, g.num_states), jnp.float32) + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]

    def step(carry, inp):
        beta, bacc, bnorm = carry
        obs_s, ref_t, alpha_t, aacc_t, anorm_t, t = inp
        # gradient at frame t: gamma_state · (E[acc through t] + E[acc after t] − F)
        log_gamma = (alpha_t + anorm_t[:, None] + beta + bnorm[:, None]
                     - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        contrib = gamma_s * (aacc_t + bacc - f[:, None])
        # beta/bacc recursion for frame t
        a_t = frame_accuracy(lab[None, :], ref_t[:, None], level, silence)
        y_log = obs_s + beta
        m = jnp.maximum(jnp.max(y_log, axis=1, keepdims=True), NEG_INF)
        y = jnp.exp(y_log - m)
        denom = jnp.dot(y, w_exp_t, precision=_gemm_precision())
        numer = jnp.dot(y * (a_t + bacc), w_exp_t, precision=_gemm_precision())
        new_beta = (jnp.where(denom > 0, jnp.log(jnp.where(denom > 0, denom, 1.0)),
                              NEG_INF) + m)
        new_bacc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.maximum(jnp.max(new_beta, axis=1, keepdims=True), NEG_INF)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        beta = jnp.where(active, new_beta_n, beta)
        bacc = jnp.where(active, new_bacc, bacc)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bacc, bnorm), contrib

    obs_s = _gather_obs_d(obs, g)
    ref_t = jnp.swapaxes(ref, 0, 1)
    ts = jnp.arange(t_len)
    _, contribs = jax.lax.scan(
        step, (beta0, bacc0, bnorm0),
        (obs_s, ref_t, alphas, aaccs, norms, ts), reverse=True)
    # state→pdf scatter as ONE batched segment-sum after the scan (see
    # _occupancies_d)
    s_dim = contribs.shape[2]
    grads = jax.vmap(
        lambda row: jax.ops.segment_sum(row, g.state_pdf, num_segments=p_dim)
    )(contribs.reshape(t_len * b, s_dim)).reshape(t_len, b, p_dim)
    grad = jnp.swapaxes(grads, 0, 1)
    return (ct[:, None, None] * grad, None, None)


fsa_expected_accuracy_dense.defvjp(_smbr_dense_fwd, _smbr_dense_bwd)
