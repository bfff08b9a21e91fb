"""Structured forward-backward for bigram phone-LM denominator graphs.

The generic arc-table kernels (ops/fb.py) pay O(E) gather/scatter per frame —
for a 3-state x 41-phone bigram den graph that is ~80k arcs and dominated the
MMI step (~1s at flagship scale). But graphs built by make_den_graph have
exact structure: per-phone left-to-right HMM chains + one dense phone-bigram
crossbar. The recursion then factorizes into O(P·J) elementwise work plus a
[B,P]x[P,P] crossbar GEMM and a [B,P·J]x[P·J,num_pdfs] one-hot GEMM per
frame — all MXU/VPU native, no scatters (SURVEY.md §8 hard part 1's "banded
states" plan, realized through the LM structure instead of banding).

States are (phone p, hmm-state j); arcs emit the DESTINATION state's pdf
(the graph-compiler convention, graph/compile.py):

  alpha'[p,0]  = obs[pdf(p,0)]  + lse(alpha[p,0]+w_self[p,0], cross_in[p])
  alpha'[p,j]  = obs[pdf(p,j)]  + lse(alpha[p,j]+w_self[p,j],
                                      alpha[p,j-1]+w_fwd[p,j-1])
  cross_in[p]  = lse_q(alpha[q,J-1] + w_exit[q] + logLM[q,p])   (GEMM)
                 ⊕ start_mass + log_init[p]                      (t=0 only)
  logZ         = lse_p(alpha_T[p,J-1] + w_exit[p] + log_final[p])
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.graph.transition_model import TransitionModel
from pykaldi2_tpu.ops.fb import NEG_INF, frame_accuracy


class BigramDenGraph(NamedTuple):
    """Structured denominator graph (uniform J states per phone)."""

    pdf: jax.Array        # [P, J] int32 pdf of each (phone, state)
    w_self: jax.Array     # [P, J] log self-loop prob
    w_fwd: jax.Array      # [P, J] log forward prob (j→j+1; j=J-1 is exit)
    log_init: jax.Array   # [P]
    lm_lin: jax.Array     # [P, P] exp(log P(q|p)) crossbar
    log_final: jax.Array  # [P]
    onehot: jax.Array     # [P*J, num_pdfs] f32 one-hot of pdf (gamma GEMM)
    phone_ids: jax.Array  # [P] int32 phone id of each row (MPE accuracy)
    num_pdfs: int


def make_bigram_den(tm: TransitionModel, phone_lm: dict, num_pdfs: int | None = None) -> BigramDenGraph:
    """Build the structured graph (topology must be uniform left-to-right)."""
    phones = phone_lm["phones"]
    J = len(tm.topo.states_for(phones[0]))
    num_pdfs = num_pdfs or tm.num_pdfs
    P = len(phones)
    pdf = np.zeros((P, J), np.int32)
    w_self = np.zeros((P, J), np.float32)
    w_fwd = np.zeros((P, J), np.float32)
    for i, p in enumerate(phones):
        states = tm.topo.states_for(p)
        if len(states) != J:
            raise ValueError("bigram den kernel needs a uniform topology")
        for j, st in enumerate(states):
            pdf[i, j] = tm.pdf_for(p, j)
            for k, (nxt, _prob) in enumerate(st.transitions):
                _, logp, _ = tm.transition(p, j, k)
                if nxt == j:
                    w_self[i, j] = logp
                else:
                    w_fwd[i, j] = logp
    li = phone_lm["log_init"][phones].astype(np.float32)
    lb = phone_lm["log_bigram"][np.ix_(phones, phones)].astype(np.float32)
    lf = phone_lm["log_final"][phones].astype(np.float32)
    onehot = np.zeros((P * J, num_pdfs), np.float32)
    onehot[np.arange(P * J), pdf.reshape(-1)] = 1.0
    return BigramDenGraph(
        pdf=jnp.asarray(pdf), w_self=jnp.asarray(w_self), w_fwd=jnp.asarray(w_fwd),
        log_init=jnp.asarray(np.nan_to_num(li, neginf=NEG_INF)),
        lm_lin=jnp.asarray(np.exp(np.nan_to_num(lb, neginf=-np.inf))),
        log_final=jnp.asarray(np.nan_to_num(lf, neginf=NEG_INF)),
        onehot=jnp.asarray(onehot),
        phone_ids=jnp.asarray(np.asarray(phones, np.int32)), num_pdfs=num_pdfs,
    )


def _lse2(a, b):
    m = jnp.maximum(a, b)
    m = jnp.maximum(m, NEG_INF)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def _obs_states(obs_t, g: BigramDenGraph):
    """obs for every (p,j) state: [B, P, J] gathered from [B, num_pdfs]."""
    return obs_t[:, g.pdf]


def _gather_obs(obs, g: BigramDenGraph):
    """[B, T, num_pdfs] → [T, B, P, J] once, OUTSIDE the scans.

    Gathering inside the scan body reads the full [B, num_pdfs] frame from
    HBM per sequential step and lowers as a per-iteration gather — hoisting
    it shrinks each step's traffic ~num_pdfs/(P·J)-fold (measured: the
    whole fwd+grad dropped 76→~25 ms at B=64/T=400/P=8952)."""
    sel = obs[:, :, g.pdf.reshape(-1)]          # one coalesced gather
    b, t_len, _ = obs.shape
    P, J = g.pdf.shape
    return jnp.swapaxes(sel, 0, 1).reshape(t_len, b, P, J)


def _fwd_scan(obs, g: BigramDenGraph, num_frames):
    b, t_len, _ = obs.shape
    P, J = g.pdf.shape

    def step(carry, inp):
        alpha, norm, start_mass = carry
        obs_pj, t = inp                                                # [B,P,J]
        # crossbar: exit scores → entry of every phone (linear-domain GEMM)
        exit_score = alpha[:, :, J - 1] + g.w_fwd[None, :, J - 1]      # [B,P]
        mx = jnp.max(exit_score, axis=1, keepdims=True)
        mx = jnp.maximum(mx, NEG_INF)
        cross_lin = jnp.exp(exit_score - mx) @ g.lm_lin                # [B,P]
        cross = jnp.where(cross_lin > 0,
                          jnp.log(jnp.where(cross_lin > 0, cross_lin, 1.0)), NEG_INF) + mx
        cross = _lse2(cross, start_mass[:, None] + g.log_init[None, :])
        stay = alpha + g.w_self[None]
        enter0 = cross
        enter_j = alpha[:, :, :-1] + g.w_fwd[None, :, :-1]
        prev = jnp.concatenate([enter0[:, :, None], enter_j], axis=2)  # [B,P,J]
        new_alpha = obs_pj + _lse2(stay, prev)
        m2 = jnp.max(new_alpha.reshape(b, -1), axis=1)
        m2 = jnp.maximum(m2, NEG_INF)
        new_alpha = new_alpha - m2[:, None, None]
        new_norm = norm + m2
        active = t < num_frames
        alpha = jnp.where(active[:, None, None], new_alpha, alpha)
        norm = jnp.where(active, new_norm, norm)
        start_mass = jnp.where(active, jnp.full_like(start_mass, NEG_INF), start_mass)
        return (alpha, norm, start_mass), (alpha, norm)

    alpha0 = jnp.full((b, P, J), NEG_INF, jnp.float32) + 0.0 * jnp.sum(obs * 0.0)
    norm0 = jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0, 0]
    start0 = jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0, 0]
    obs_sel = _gather_obs(obs, g)
    ts = jnp.arange(t_len)
    (alpha_T, norm_T, _), (alphas, norms) = jax.lax.scan(
        step, (alpha0, norm0, start0), (obs_sel, ts))
    final = alpha_T[:, :, J - 1] + g.w_fwd[None, :, J - 1] + g.log_final[None, :]
    logz = jax.nn.logsumexp(jnp.maximum(final, NEG_INF), axis=1) + norm_T
    return logz, (alphas, norms)


@jax.custom_vjp
def bigram_logz(obs, graph: BigramDenGraph, num_frames):
    """[B] log partition over the structured bigram den graph."""
    return _fwd_scan(obs, graph, num_frames)[0]


def _bigram_fwd(obs, graph, num_frames):
    logz, (alphas, norms) = _fwd_scan(obs, graph, num_frames)
    return logz, (obs, graph, num_frames, logz, alphas, norms)


def _bigram_bwd(res, ct):
    obs, g, num_frames, logz, alphas, norms = res
    gamma = bigram_occupancies_from(obs, g, num_frames, logz, alphas, norms)
    return (ct[:, None, None] * gamma, None, None)


def bigram_occupancies_from(obs, g: BigramDenGraph, num_frames, logz, alphas, norms):
    """gamma [B, T, num_pdfs] via the structured beta recursion."""
    b, t_len, _ = obs.shape
    P, J = g.pdf.shape
    lm_lin_T = g.lm_lin.T

    beta_T = jnp.full((b, P, J), NEG_INF, jnp.float32).at[:, :, J - 1].set(
        g.w_fwd[None, :, J - 1] + g.log_final[None, :]) + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]

    def step(carry, inp):
        beta, bnorm = carry
        obs_pj, alpha_t, anorm_t, t = inp
        # gamma at frame t: state posterior with alpha AFTER frame t
        g_state = alpha_t + anorm_t[:, None, None] + beta + bnorm[:, None, None] - logz[:, None, None]
        gamma_lin = jnp.exp(jnp.minimum(g_state, 0.0))
        active = t < num_frames
        gamma_lin = jnp.where(active[:, None, None], gamma_lin, 0.0)
        # beta recursion to frame t (consuming obs at t)
        arrive = obs_pj + beta                                          # [B,P,J]
        stay = g.w_self[None] + arrive
        fwd = jnp.concatenate(
            [g.w_fwd[None, :, :-1] + arrive[:, :, 1:],
             jnp.full((b, P, 1), NEG_INF) + 0.0 * arrive[:, :, :1]], axis=2)
        # last state also exits through the crossbar
        entry = arrive[:, :, 0]                                         # [B,P]
        mx = jnp.maximum(jnp.max(entry, axis=1, keepdims=True), NEG_INF)
        cross_lin = jnp.exp(entry - mx) @ lm_lin_T                      # [B,P]
        cross = jnp.where(cross_lin > 0,
                          jnp.log(jnp.where(cross_lin > 0, cross_lin, 1.0)), NEG_INF) + mx
        cross_full = jnp.full((b, P, J), NEG_INF).at[:, :, J - 1].set(
            g.w_fwd[None, :, J - 1] + cross) + 0.0 * arrive
        new_beta = _lse2(_lse2(stay, fwd), cross_full)
        m2 = jnp.maximum(jnp.max(new_beta.reshape(b, -1), axis=1), NEG_INF)
        new_beta = new_beta - m2[:, None, None]
        new_bnorm = bnorm + m2
        beta = jnp.where(active[:, None, None], new_beta, beta)
        bnorm = jnp.where(active, new_bnorm, bnorm)
        return (beta, bnorm), gamma_lin

    obs_sel = _gather_obs(obs, g)
    ts = jnp.arange(t_len)
    _, gammas_lin = jax.lax.scan(step, (beta_T, bnorm0),
                                 (obs_sel, alphas, norms, ts), reverse=True)
    # (p,j)→pdf projection as ONE [T·B, P·J] GEMM after the scan: inside the
    # body it was a per-iteration [B, num_pdfs] GEMM + HBM write, which made
    # the backward 5x the forward (sequential latency, not FLOPs)
    gammas = (gammas_lin.reshape(t_len * b, P * J) @ g.onehot
              ).reshape(t_len, b, g.num_pdfs)
    return jnp.swapaxes(gammas, 0, 1)


bigram_logz.defvjp(_bigram_fwd, _bigram_bwd)


def bigram_occupancies(obs, graph: BigramDenGraph, num_frames):
    logz, (alphas, norms) = _fwd_scan(obs, graph, num_frames)
    return logz, bigram_occupancies_from(obs, graph, num_frames, logz, alphas, norms)


# ---------------------------------------------------------------------------
# expected accuracy (sMBR / MPE) on the structured graph
# ---------------------------------------------------------------------------


def _state_acc(g: BigramDenGraph, ref_t, level: str, silence=None):
    """[B, P, J] per-frame accuracy of being in each state vs ref labels."""
    if level == "pdf":
        lab = g.pdf[None]                              # [1, P, J]
    elif level == "phone":
        lab = g.phone_ids[None, :, None]
    else:
        raise ValueError(level)
    return frame_accuracy(lab, ref_t[:, None, None], level, silence)


def _smbr_fwd_scan(obs, g: BigramDenGraph, ref, num_frames, level, silence=None):
    b, t_len, _ = obs.shape
    P, J = g.pdf.shape

    def step(carry, inp):
        alpha, aacc, norm, start_mass = carry
        obs_pj, ref_t, t = inp
        a_t = _state_acc(g, ref_t, level, silence)                     # [B,P,J]
        # linear-domain path weights relative to per-batch max
        exit_score = alpha[:, :, J - 1] + g.w_fwd[None, :, J - 1]
        stay = alpha + g.w_self[None]
        enter_j = alpha[:, :, :-1] + g.w_fwd[None, :, :-1]
        # normalizer must cover the start mass too: at t=0 alpha is all
        # NEG_INF and the start term is the only live path
        m = jnp.maximum(
            jnp.maximum(jnp.max(alpha.reshape(b, -1), axis=1),
                        start_mass + jnp.max(g.log_init)),
            NEG_INF)[:, None, None]
        stay_lin = jnp.exp(stay - m)
        enter_lin = jnp.concatenate(
            [jnp.zeros((b, P, 1)) + 0.0 * alpha[:, :, :1], jnp.exp(enter_j - m)], axis=2)
        exit_lin = jnp.exp(exit_score - m[:, :, 0])
        cross_lin = exit_lin @ g.lm_lin                                # [B,P]
        cross_acc_num = (exit_lin * aacc[:, :, J - 1]) @ g.lm_lin      # [B,P]
        start_lin = jnp.exp(start_mass[:, None] + g.log_init[None, :] - m[:, :, 0])
        # combine: denominator (prob mass) and numerator (acc-weighted)
        denom = stay_lin + enter_lin
        denom = denom.at[:, :, 0].add(cross_lin + start_lin)
        acc_prev = jnp.concatenate(
            [jnp.zeros((b, P, 1)) + 0.0 * aacc[:, :, :1], aacc[:, :, :-1]], axis=2)
        numer = stay_lin * aacc + enter_lin * acc_prev
        numer = numer.at[:, :, 0].add(cross_acc_num)                   # start path acc = 0
        new_alpha = jnp.where(denom > 0,
                              jnp.log(jnp.where(denom > 0, denom, 1.0)), NEG_INF) + m
        new_aacc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        new_aacc = new_aacc + a_t  # every arc into (p,j) at t scores a_t(p,j)
        new_alpha = new_alpha + obs_pj
        m2 = jnp.maximum(jnp.max(new_alpha.reshape(b, -1), axis=1), NEG_INF)
        new_alpha = new_alpha - m2[:, None, None]
        new_norm = norm + m2
        active = t < num_frames
        alpha = jnp.where(active[:, None, None], new_alpha, alpha)
        aacc = jnp.where(active[:, None, None], new_aacc, aacc)
        norm = jnp.where(active, new_norm, norm)
        start_mass = jnp.where(active, jnp.full_like(start_mass, NEG_INF), start_mass)
        return (alpha, aacc, norm, start_mass), (alpha, aacc, norm)

    vma = 0.0 * jnp.sum(obs * 0.0)
    alpha0 = jnp.full((b, P, J), NEG_INF, jnp.float32) + vma
    aacc0 = jnp.zeros((b, P, J), jnp.float32) + vma
    norm0 = jnp.zeros((b,), jnp.float32) + vma
    start0 = jnp.zeros((b,), jnp.float32) + vma
    obs_sel = _gather_obs(obs, g)
    ref_t = jnp.swapaxes(ref, 0, 1)
    ts = jnp.arange(t_len)
    (alpha_T, aacc_T, norm_T, _), (alphas, aaccs, norms) = jax.lax.scan(
        step, (alpha0, aacc0, norm0, start0), (obs_sel, ref_t, ts))
    final = alpha_T[:, :, J - 1] + g.w_fwd[None, :, J - 1] + g.log_final[None, :]
    final = jnp.maximum(final, NEG_INF)
    w = jax.nn.softmax(final, axis=1)
    f = jnp.sum(w * aacc_T[:, :, J - 1], axis=1)
    logz = jax.nn.logsumexp(final, axis=1) + norm_T
    return f, (alphas, aaccs, norms, logz, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def bigram_expected_accuracy(obs, graph: BigramDenGraph, ref, num_frames,
                             level: str = "pdf", silence=None):
    """E[#correct frames] under the structured den posterior: [B].

    ``silence`` applies Kaldi's MpeVariants silence-phone rules
    (ops/fb.SilenceOpts).
    """
    return _smbr_fwd_scan(obs, graph, ref, num_frames, level, silence)[0]


def _bsmbr_fwd(obs, graph, ref, num_frames, level, silence):
    f, res = _smbr_fwd_scan(obs, graph, ref, num_frames, level, silence)
    return f, (obs, ref, num_frames) + res


def _bsmbr_bwd(g, level, silence, res, ct):
    obs, ref, num_frames, alphas, aaccs, norms, logz, f = res
    b, t_len, p_dim = obs.shape
    P, J = g.pdf.shape
    lm_lin_T = g.lm_lin.T

    vma = 0.0 * alphas[0]
    beta_T = (jnp.full((b, P, J), NEG_INF, jnp.float32)
              .at[:, :, J - 1].set(g.w_fwd[None, :, J - 1] + g.log_final[None, :]) + vma)
    bacc_T = jnp.zeros((b, P, J), jnp.float32) + vma
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]

    def step(carry, inp):
        beta, bacc, bnorm = carry
        obs_pj, ref_t, alpha_t, aacc_t, anorm_t, t = inp
        active = t < num_frames
        # gradient at frame t: gamma_state * (E[acc|state] − F)
        g_state = (alpha_t + anorm_t[:, None, None] + beta + bnorm[:, None, None]
                   - logz[:, None, None])
        gamma = jnp.exp(jnp.minimum(g_state, 0.0))
        c_state = aacc_t + bacc
        contrib = gamma * (c_state - f[:, None, None])
        contrib = jnp.where(active[:, None, None], contrib, 0.0)
        # beta/bacc recursion through frame t
        a_t = _state_acc(g, ref_t, level, silence)
        arrive = obs_pj + beta                                         # to-state score
        arr_acc = a_t + bacc                                           # acc from t onward via that state
        m = jnp.maximum(jnp.max(arrive.reshape(b, -1), axis=1), NEG_INF)[:, None, None]
        stay_lin = jnp.exp(g.w_self[None] + arrive - m)
        fwd_lin = jnp.concatenate(
            [jnp.exp(g.w_fwd[None, :, :-1] + arrive[:, :, 1:] - m),
             jnp.zeros((b, P, 1)) + vma[:, :, :1]], axis=2)
        entry_lin = jnp.exp(arrive[:, :, 0] - m[:, :, 0])              # [B,P]
        cross_lin = entry_lin @ lm_lin_T
        cross_acc = (entry_lin * arr_acc[:, :, 0]) @ lm_lin_T
        denom = stay_lin + fwd_lin
        acc_next = jnp.concatenate(
            [arr_acc[:, :, 1:], jnp.zeros((b, P, 1)) + vma[:, :, :1]], axis=2)
        numer = stay_lin * arr_acc + fwd_lin * acc_next
        ex_lin = jnp.exp(g.w_fwd[None, :, J - 1])       # exit prob of each phone
        denom = denom.at[:, :, J - 1].add(ex_lin * cross_lin)
        numer = numer.at[:, :, J - 1].add(ex_lin * cross_acc)
        new_beta = jnp.where(denom > 0,
                             jnp.log(jnp.where(denom > 0, denom, 1.0)), NEG_INF) + m
        new_bacc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.maximum(jnp.max(new_beta.reshape(b, -1), axis=1), NEG_INF)
        new_beta = new_beta - m2[:, None, None]
        new_bnorm = bnorm + m2
        beta = jnp.where(active[:, None, None], new_beta, beta)
        bacc = jnp.where(active[:, None, None], new_bacc, bacc)
        bnorm = jnp.where(active, new_bnorm, bnorm)
        return (beta, bacc, bnorm), contrib

    obs_sel = _gather_obs(obs, g)
    ref_t = jnp.swapaxes(ref, 0, 1)
    ts = jnp.arange(t_len)
    _, contribs = jax.lax.scan(step, (beta_T, bacc_T, bnorm0),
                               (obs_sel, ref_t, alphas, aaccs, norms, ts),
                               reverse=True)
    # (p,j)->pdf projection as ONE big GEMM after the scan (see
    # bigram_occupancies_from): per-iteration [B, num_pdfs] outputs made
    # the backward latency-bound
    grads = (contribs.reshape(t_len * b, P * J) @ g.onehot
             ).reshape(t_len, b, g.num_pdfs)
    return (ct[:, None, None] * jnp.swapaxes(grads, 0, 1), None, None)


bigram_expected_accuracy.defvjp(_bsmbr_fwd, _bsmbr_bwd)
