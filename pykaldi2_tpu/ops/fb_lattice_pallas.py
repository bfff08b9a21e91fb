"""Pallas kernels for the banded time-synchronous lattice FB (MMI path).

VERDICT r2 item 6 / weak #4: the banded kernels' per-step work — a slot
gather, an exp, and a segment-sum over the [B, A] arc band — is tiny
(B=32, A=K=256 ⇒ ~50k elements), so the XLA scan pays per-iteration op
DISPATCH latency, not compute: the fwd+grad measured 277 ms at the
worst-case on-the-fly shape. These kernels fuse each step into one Mosaic
program with the alpha/beta carries resident in VMEM across the grid
(the ``ops/lstm_pallas.py`` sequence-kernel pattern: TPU grid steps run
sequentially and scratch persists), so a step costs a single kernel
invocation streaming only the [B, A] band blocks.

Covers the logZ forward and the occupancy backward that
``fb_lattice.lattice_logz_ts`` / ``mmi_objective_lattice_ts`` consume
(the MMI on-the-fly hot path), and — since round-5 session 3 — the
sMBR/MPE expected-accuracy forward/backward (the same recursions plus a
linear accuracy carry; the per-arc accuracies with Kaldi's silence rules
are computed OUTSIDE in XLA and streamed in as a [T,B,A] band, so the
kernels are criterion-agnostic). Gating: ``use_pallas_latfb`` (default ON
for the TPU backend after the round-5 on-chip verdict; ``n_acc=2`` for
the sMBR budget) — fb_lattice.py consults it per call and silently falls
back for unsupported shapes (B % 8, A % 128, VMEM budget).

FORMULATION (round 5, VERDICT r4 weak #7): the round-3 kernels used
``take_along_axis`` gathers and ``.at[].add`` scatters — the exact
primitives this image's Mosaic cannot lower.  This rewrite removes BOTH:
the slot gather and the dst segment-sum are one-hot batched matmuls
(``[B,A,K] @ [B,K]`` and its transpose), with every dot result written to
a VMEM scratch ref and read back BEFORE any elementwise op touches it —
the round-3 probe found the one-hot einsums compile ALONE and only the
fused dot→elementwise chain trips Mosaic's "only constant accumulators
supported", so the ref round-trip severs that chain.  Round-5 session-3
chip probe: batched ``tpu.matmul`` additionally requires the contracting
dim of BOTH operands to be the LAST dim when the rhs is vector-like, so
the scatter dot uses a transposed one-hot built directly from iota
(`_onehot_t`) — with that, BOTH kernels lower and run on this image for
the first time.  One-hot × value
under ``precision=HIGHEST`` is exact in f32 (the bf16-triple expansion
represents f32 inputs exactly; each output sums exactly one product), so
parity with the XLA scan is bit-level, not approximate.

ROUND-3 probe history (kept for the record): ``take_along_axis`` along
lanes fails to compile; ``.at[].add`` scatter, ``dynamic_slice`` with a
traced lane offset, and ``optimization_barrier`` are "Unimplemented
primitive"; a pallas-call-in-scan compile takes ~10 min through the
remote tunnel.  The XLA scan reference for the fused step is 101 ms /
448 frames on chip, bounding the headroom (~0.2 ms/frame of dispatch
latency) a working kernel buys.  See BASELINE.md for the round-5 on-chip
verdict on THIS formulation.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pykaldi2_tpu.ops.fb import NEG_INF
from pykaldi2_tpu.ops.lstm_pallas import _match_vma, _sds


def _pad128(k: int) -> int:
    """Slot count padded to the lane multiple the kernels require.  Pad
    slots are inert: gathers/scatters only ever address idx < k (one-hot
    compares cannot match a pad lane), so alphas/betas at pads stay at
    their NEG_INF init and the ≤k prefix is bit-identical to a k-wide
    kernel.  The fb_lattice shims pad `final`/`alpha_prev` with NEG_INF
    and slice the residuals back."""
    return -(-k // 128) * 128


def _chunk_a(b: int, k: int, a: int) -> int:
    """Band-axis chunk width: the [B, CA, K] one-hot transient is the
    dominant VMEM cost of the matmul formulation, so wide bands process
    the band in 128-arc slices (two live one-hot orientations budgeted at
    ~4 MiB each at the OTF shapes)."""
    kp = _pad128(k)
    if 4 * b * a * kp <= 4 * 1024 * 1024:
        return a
    return 128


def use_pallas_latfb(b: int, k: int, a: int, n_acc: int = 1) -> bool:
    """``n_acc=1``: the MMI logZ/occupancy kernels; ``n_acc=2``: the sMBR
    expected-accuracy kernels (an extra [B,K] carry + denom/numer scratch
    pair + two extra [B,A] gather scratches each way)."""
    env = os.environ.get("PK2_PALLAS_LATFB")
    if env is not None and env not in ("0", "1"):
        raise ValueError(f"PK2_PALLAS_LATFB={env!r}: expected 0 or 1")
    if env == "0":
        return False
    if env != "1":
        # default: ON for the real TPU backend after the round-5 on-chip
        # verdict (parity vs both XLA forms + 1.94x timing at the lat_mmi
        # bench shape — BASELINE.md round 5); an explicit
        # PK2_LATFB_MATVEC=1 keeps the XLA matvec route
        import jax

        if jax.default_backend() != "tpu":
            return False
        if os.environ.get("PK2_LATFB_MATVEC") == "1":
            return False
    kp = _pad128(k)
    ca = _chunk_a(b, k, a)
    return (b % 8 == 0 and a % 128 == 0
            # carries + band blocks + two chunked one-hot transients
            and (4 * b * ((4 * n_acc - 2) * kp + 6 * n_acc * a) + 8 * b
                 + 2 * 4 * b * ca * kp) < 12 * 1024 * 1024)


def _onehot(idx, k):
    """idx [B, A] int32 → exact {0,1} f32 one-hot [B, A, k]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (k,), 2)
    return (idx[:, :, None] == lane).astype(jnp.float32)


def _onehot_t(idx, k):
    """idx [B, A] int32 → the TRANSPOSED one-hot [B, k, A], built directly
    from iota (a [B,A,K]→[B,K,A] transpose inside the kernel would be a
    relayout; two iota-compares are VPU-trivial). Mosaic's batched
    `tpu.matmul` only lowers when the contracting dim of BOTH operands is
    the LAST dim and the rhs is vector-like [B, n] — the round-5 on-chip
    probe hit exactly that (`rhs non contracting dims must be an
    infix/suffix … or the contracting dim of lhs/rhs must be the last
    dim`), so the scatter dot contracts A as the last dim of this layout."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], k) + idx.shape[1:], 1)
    return (idx[:, None, :] == lane).astype(jnp.float32)


_DN_GATHER = (((2,), (1,)), ((0,), (0,)))   # [B,A,K] · [B,K] → [B,A]
_DN_SCATTER = (((2,), (1,)), ((0,), (0,)))  # [B,K,A] · [B,A] → [B,K]


def _gather_dot(oh, vals):
    """vals[b, idx[b, a]] as a one-hot batched matmul (MXU, exact)."""
    return jax.lax.dot_general(oh, vals, _DN_GATHER,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _scatter_add_dot(oh_t, vals):
    """per-row segment sum Σ_a vals[b,a]·[idx[b,a]==k] → [B, K];
    ``oh_t`` is the transposed one-hot from `_onehot_t` (see its note)."""
    return jax.lax.dot_general(oh_t, vals, _DN_SCATTER,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward: alpha recursion (logZ residuals)
# ---------------------------------------------------------------------------


def _fwd_kernel(obs_ref, src_ref, dst_ref, w_ref, act_ref,
                alphas_ref, norms_ref, alpha_s, norm_s, gat_s, sum_s,
                chunk_s, *, k, ca):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, alpha_s.shape, 1)
        alpha_s[:] = jnp.where(lane == 0, 0.0, NEG_INF)
        norm_s[:] = jnp.zeros_like(norm_s)

    alpha = alpha_s[:]                                   # [B, K]
    a = gat_s.shape[1]
    # dot results round-trip through scratch refs before ANY elementwise
    # op reads them (severs the Mosaic accumulator chain — module
    # docstring); the band is processed in ca-wide chunks so the [B,CA,K]
    # one-hot transients stay within VMEM at wide-band shapes
    for c in range(0, a, ca):
        gat_s[:, c:c + ca] = _gather_dot(
            _onehot(src_ref[0][:, c:c + ca], k), alpha)
    score = gat_s[:] + w_ref[0] + obs_ref[0]
    mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
    lin = jnp.exp(score - mx)
    for i, c in enumerate(range(0, a, ca)):
        chunk_s[:] = _scatter_add_dot(
            _onehot_t(dst_ref[0][:, c:c + ca], k), lin[:, c:c + ca])
        sum_s[:] = chunk_s[:] if i == 0 else sum_s[:] + chunk_s[:]
    summed = sum_s[:]
    new_alpha = jnp.where(summed > 0,
                          jnp.log(jnp.where(summed > 0, summed, 1.0)),
                          NEG_INF) + mx
    m2 = jnp.max(new_alpha, axis=1, keepdims=True)
    new_alpha = new_alpha - m2
    act = act_ref[0]                                     # [B, 1]
    alpha_s[:] = act * new_alpha + (1.0 - act) * alpha
    norm_s[:] = norm_s[:] + act * m2
    alphas_ref[0] = alpha_s[:]
    norms_ref[0] = norm_s[:]


def make_logz_fwd(k: int):
    """obs_arc/w [T,B,A] f32, src/dst [T,B,A] i32, active [T,B,1] f32 →
    (alphas [T,B,k], norms [T,B]); k = the lattice's slot count."""
    def run(obs_arc, src, dst, w, active):
        obs_arc, src, dst, w, active = _match_vma(obs_arc, src, dst, w, active)
        t_len, b, a = obs_arc.shape
        ca = _chunk_a(b, k, a)
        io = lambda t: (t, 0, 0)
        alphas, norms = pl.pallas_call(
            functools.partial(_fwd_kernel, k=k, ca=ca),
            grid=(t_len,),
            in_specs=[pl.BlockSpec((1, b, a), io, memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((1, b, 1), io, memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, b, k), io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 1), io, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                _sds((t_len, b, k), jnp.float32, obs_arc),
                _sds((t_len, b, 1), jnp.float32, obs_arc),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, 1), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
            ],
        )(obs_arc, src, dst, w, active)
        return alphas, norms[:, :, 0]

    return run


# ---------------------------------------------------------------------------
# backward: beta recursion + per-arc occupancies
# ---------------------------------------------------------------------------


def _bwd_kernel(obs_ref, src_ref, dst_ref, w_ref, act_ref, aprev_ref,
                anorm_ref, final_ref, logz_ref, gamma_ref, beta_s, bnorm_s,
                gat_s, sum_s, ga2_s, chunk_s, *, k, ca):
    t = pl.program_id(0)  # reversed via index maps

    @pl.when(t == 0)
    def _():
        beta_s[:] = final_ref[:]
        bnorm_s[:] = jnp.zeros_like(bnorm_s)

    beta = beta_s[:]
    bnorm = bnorm_s[:]
    obs_w = w_ref[0] + obs_ref[0]
    a = gat_s.shape[1]
    for c in range(0, a, ca):
        gat_s[:, c:c + ca] = _gather_dot(
            _onehot(dst_ref[0][:, c:c + ca], k), beta)
    beta_dst = gat_s[:]
    score = obs_w + beta_dst
    mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
    lin = jnp.exp(score - mx)
    for i, c in enumerate(range(0, a, ca)):
        chunk_s[:] = _scatter_add_dot(
            _onehot_t(src_ref[0][:, c:c + ca], k), lin[:, c:c + ca])
        sum_s[:] = chunk_s[:] if i == 0 else sum_s[:] + chunk_s[:]
    summed = sum_s[:]
    new_beta = jnp.where(summed > 0,
                         jnp.log(jnp.where(summed > 0, summed, 1.0)),
                         NEG_INF) + mx
    m2 = jnp.max(new_beta, axis=1, keepdims=True)
    new_beta_n = new_beta - m2
    for c in range(0, a, ca):
        ga2_s[:, c:c + ca] = _gather_dot(
            _onehot(src_ref[0][:, c:c + ca], k), aprev_ref[0])
    log_gamma = (ga2_s[:] + anorm_ref[0]
                 + obs_w + beta_dst + bnorm - logz_ref[:])
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    act = act_ref[0]
    gamma_ref[0] = act * gamma
    beta_s[:] = act * new_beta_n + (1.0 - act) * beta
    bnorm_s[:] = bnorm + act * m2


def make_occupancies_bwd(k: int):
    def run(obs_arc, src, dst, w, active, alpha_prev, anorm_prev, final, logz):
        """→ gamma_arc [T, B, A] (per-arc posteriors; pdf scatter outside)."""
        (obs_arc, src, dst, w, active, alpha_prev, anorm_prev, final,
         logz) = _match_vma(obs_arc, src, dst, w, active, alpha_prev,
                           anorm_prev, final, logz)
        t_len, b, a = obs_arc.shape
        ca = _chunk_a(b, k, a)
        rev = lambda t: (t_len - 1 - t, 0, 0)
        fin = lambda t: (0, 0)
        (gamma,) = pl.pallas_call(
            functools.partial(_bwd_kernel, k=k, ca=ca),
            grid=(t_len,),
            in_specs=[pl.BlockSpec((1, b, a), rev, memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((1, b, 1), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, k), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, 1), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((b, k), fin, memory_space=pltpu.VMEM),
               pl.BlockSpec((b, 1), fin, memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, b, a), rev, memory_space=pltpu.VMEM)],
            out_shape=[_sds((t_len, b, a), jnp.float32, obs_arc)],
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, 1), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
            ],
        )(obs_arc, src, dst, w, active, alpha_prev, anorm_prev, final, logz)
        return gamma

    return run


# ---------------------------------------------------------------------------
# sMBR / MPE: expected-accuracy forward + contribution backward
# (fb_lattice._smbr_fwd_ts / _smbr_ts_bwd scan forms, one-hot-matmul'd;
#  the acc recursion carries a LINEAR per-slot expected accuracy alongside
#  the renormalized log alpha/beta — numer/denom are two scatter dots
#  sharing the same transposed one-hot)
# ---------------------------------------------------------------------------


def _smbr_fwd_kernel(obs_ref, src_ref, dst_ref, w_ref, act_ref, acc_ref,
                     alphas_ref, aaccs_ref, norms_ref, alpha_s, aacc_s,
                     norm_s, gat_s, gac_s, sum_s, num_s, chunk_s, *, k, ca):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, alpha_s.shape, 1)
        alpha_s[:] = jnp.where(lane == 0, 0.0, NEG_INF)
        aacc_s[:] = jnp.zeros_like(aacc_s)
        norm_s[:] = jnp.zeros_like(norm_s)

    alpha = alpha_s[:]                                   # [B, K] log, renorm
    aacc = aacc_s[:]                                     # [B, K] linear acc
    a = gat_s.shape[1]
    for c in range(0, a, ca):
        oh = _onehot(src_ref[0][:, c:c + ca], k)
        gat_s[:, c:c + ca] = _gather_dot(oh, alpha)
        gac_s[:, c:c + ca] = _gather_dot(oh, aacc)
    score = gat_s[:] + w_ref[0] + obs_ref[0]
    mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
    lin = jnp.exp(score - mx)
    acc_in = gac_s[:] + acc_ref[0]
    for i, c in enumerate(range(0, a, ca)):
        oh_t = _onehot_t(dst_ref[0][:, c:c + ca], k)
        chunk_s[:] = _scatter_add_dot(oh_t, lin[:, c:c + ca])
        sum_s[:] = chunk_s[:] if i == 0 else sum_s[:] + chunk_s[:]
        chunk_s[:] = _scatter_add_dot(oh_t, (lin * acc_in)[:, c:c + ca])
        num_s[:] = chunk_s[:] if i == 0 else num_s[:] + chunk_s[:]
    denom = sum_s[:]
    numer = num_s[:]
    new_alpha = jnp.where(denom > 0,
                          jnp.log(jnp.where(denom > 0, denom, 1.0)),
                          NEG_INF) + mx
    new_acc = jnp.where(denom > 0,
                        numer / jnp.where(denom > 0, denom, 1.0), 0.0)
    m2 = jnp.max(new_alpha, axis=1, keepdims=True)
    new_alpha = new_alpha - m2
    act = act_ref[0]                                     # [B, 1]
    alpha_s[:] = act * new_alpha + (1.0 - act) * alpha
    aacc_s[:] = act * new_acc + (1.0 - act) * aacc
    norm_s[:] = norm_s[:] + act * m2
    alphas_ref[0] = alpha_s[:]
    aaccs_ref[0] = aacc_s[:]
    norms_ref[0] = norm_s[:]


def make_smbr_fwd(k: int):
    """obs_arc/w/arc_acc [T,B,A] f32, src/dst [T,B,A] i32, active [T,B,1]
    → (alphas [T,B,k] log-renorm, aaccs [T,B,k] linear, norms [T,B])."""
    def run(obs_arc, src, dst, w, active, arc_acc):
        (obs_arc, src, dst, w, active,
         arc_acc) = _match_vma(obs_arc, src, dst, w, active, arc_acc)
        t_len, b, a = obs_arc.shape
        ca = _chunk_a(b, k, a)
        io = lambda t: (t, 0, 0)
        alphas, aaccs, norms = pl.pallas_call(
            functools.partial(_smbr_fwd_kernel, k=k, ca=ca),
            grid=(t_len,),
            in_specs=[pl.BlockSpec((1, b, a), io, memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((1, b, 1), io, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, a), io, memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, b, k), io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, k), io, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, 1), io, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                _sds((t_len, b, k), jnp.float32, obs_arc),
                _sds((t_len, b, k), jnp.float32, obs_arc),
                _sds((t_len, b, 1), jnp.float32, obs_arc),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, 1), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
            ],
        )(obs_arc, src, dst, w, active, arc_acc)
        return alphas, aaccs, norms[:, :, 0]

    return run


def _smbr_bwd_kernel(obs_ref, src_ref, dst_ref, w_ref, act_ref, acc_ref,
                     aprev_ref, aaprev_ref, anorm_ref, final_ref, logz_ref,
                     f_ref, contrib_ref, beta_s, bacc_s, bnorm_s, gat_s,
                     gb_s, ga2_s, gaa_s, sum_s, num_s, chunk_s, *, k, ca):
    t = pl.program_id(0)  # reversed via index maps

    @pl.when(t == 0)
    def _():
        beta_s[:] = final_ref[:]
        bacc_s[:] = jnp.zeros_like(bacc_s)
        bnorm_s[:] = jnp.zeros_like(bnorm_s)

    beta = beta_s[:]
    bacc = bacc_s[:]
    bnorm = bnorm_s[:]
    obs_w = w_ref[0] + obs_ref[0]
    arc_acc = acc_ref[0]
    a = gat_s.shape[1]
    for c in range(0, a, ca):
        oh_d = _onehot(dst_ref[0][:, c:c + ca], k)
        gat_s[:, c:c + ca] = _gather_dot(oh_d, beta)
        gb_s[:, c:c + ca] = _gather_dot(oh_d, bacc)
        oh_s = _onehot(src_ref[0][:, c:c + ca], k)
        ga2_s[:, c:c + ca] = _gather_dot(oh_s, aprev_ref[0])
        gaa_s[:, c:c + ca] = _gather_dot(oh_s, aaprev_ref[0])
    beta_dst = gat_s[:]
    bacc_dst = gb_s[:]
    log_gamma = (ga2_s[:] + anorm_ref[0]
                 + obs_w + beta_dst + bnorm - logz_ref[:])
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    c_arc = gaa_s[:] + arc_acc + bacc_dst
    act = act_ref[0]
    contrib_ref[0] = act * (gamma * (c_arc - f_ref[:]))
    score = obs_w + beta_dst
    mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
    lin = jnp.exp(score - mx)
    acc_out = arc_acc + bacc_dst
    for i, c in enumerate(range(0, a, ca)):
        oh_t = _onehot_t(src_ref[0][:, c:c + ca], k)
        chunk_s[:] = _scatter_add_dot(oh_t, lin[:, c:c + ca])
        sum_s[:] = chunk_s[:] if i == 0 else sum_s[:] + chunk_s[:]
        chunk_s[:] = _scatter_add_dot(oh_t, (lin * acc_out)[:, c:c + ca])
        num_s[:] = chunk_s[:] if i == 0 else num_s[:] + chunk_s[:]
    denom = sum_s[:]
    numer = num_s[:]
    new_beta = jnp.where(denom > 0,
                         jnp.log(jnp.where(denom > 0, denom, 1.0)),
                         NEG_INF) + mx
    new_bacc = jnp.where(denom > 0,
                         numer / jnp.where(denom > 0, denom, 1.0), 0.0)
    m2 = jnp.max(new_beta, axis=1, keepdims=True)
    new_beta_n = new_beta - m2
    beta_s[:] = act * new_beta_n + (1.0 - act) * beta
    bacc_s[:] = act * new_bacc + (1.0 - act) * bacc
    bnorm_s[:] = bnorm + act * m2


def make_smbr_contribs_bwd(k: int):
    def run(obs_arc, src, dst, w, active, arc_acc, alpha_prev, aacc_prev,
            anorm_prev, final, logz, f):
        """→ contrib [T, B, A] = γ·(c_arc − f) per arc (pdf scatter outside)."""
        (obs_arc, src, dst, w, active, arc_acc, alpha_prev, aacc_prev,
         anorm_prev, final, logz, f) = _match_vma(
            obs_arc, src, dst, w, active, arc_acc, alpha_prev, aacc_prev,
            anorm_prev, final, logz, f)
        t_len, b, a = obs_arc.shape
        ca = _chunk_a(b, k, a)
        rev = lambda t: (t_len - 1 - t, 0, 0)
        fin = lambda t: (0, 0)
        (contrib,) = pl.pallas_call(
            functools.partial(_smbr_bwd_kernel, k=k, ca=ca),
            grid=(t_len,),
            in_specs=[pl.BlockSpec((1, b, a), rev, memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((1, b, 1), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, a), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, k), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, k), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((1, b, 1), rev, memory_space=pltpu.VMEM),
               pl.BlockSpec((b, k), fin, memory_space=pltpu.VMEM),
               pl.BlockSpec((b, 1), fin, memory_space=pltpu.VMEM),
               pl.BlockSpec((b, 1), fin, memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, b, a), rev, memory_space=pltpu.VMEM)],
            out_shape=[_sds((t_len, b, a), jnp.float32, obs_arc)],
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, 1), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, a), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
            ],
        )(obs_arc, src, dst, w, active, arc_acc, alpha_prev, aacc_prev,
          anorm_prev, final, logz, f)
        return contrib

    return run
