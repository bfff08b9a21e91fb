"""Banded forward-backward over TIME-SYNCHRONOUS decoded lattices.

The generic per-utterance kernels (ops/fb_batched.py) keep [B, S] alphas over
all lattice states and save [T, B, S] for the backward pass. Decoded lattices
make that explode: with realistic beams an utterance easily carries tens of
thousands of states (max_active tokens × T frames), and a B=32 bucket padded
to S≈131k at T=800 means >13 GB of alphas — observed crashing the TPU worker.

But beam-decoder lattices are time-synchronous: every state lives at exactly
one frame (native/latdec.cc emits the state→frame map). Re-indexing states as
(frame, slot) bands the recursion: alphas are [B, K] with K = max tokens per
frame (≤ max_active), per-frame arc tables are [B, T, A] with A = max links
per frame, and the saved activations are [T, B, K] — memory drops from
O(T·B·S) to O(T·B·K), about a T× saving (SURVEY.md §8 hard-part-1's banding
plan, applied where it actually bites).

Covers logZ/occupancies (MMI) and expected accuracy (sMBR/MPE), both as
custom VJPs, mirroring fb_batched's math one frame-band at a time.
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.ops.fb import NEG_INF, log_safe as _log_safe
from pykaldi2_tpu.ops.fb_batched import _arc_acc_b, _seg_sum_b
from pykaldi2_tpu.ops.fsa import DenseFsa


class TimeSyncLattice(NamedTuple):
    """Per-frame banded arc tables. Arc a of frame t connects slot src[b,t,a]
    (at frame t) to slot dst[b,t,a] (at frame t+1) emitting pdf[b,t,a] with
    obs[b, t] — i.e. scan step t consumes observation frame t. Padding arcs
    carry NEG_INF weight. ``final`` holds each utterance's final weights on
    the slots of its LAST frame (frozen alphas line up with it).
    """

    src: jax.Array      # [B, T, A] int32
    dst: jax.Array      # [B, T, A] int32
    pdf: jax.Array      # [B, T, A] int32
    weight: jax.Array   # [B, T, A] f32
    final: jax.Array    # [B, K] f32

    @property
    def num_slots(self) -> int:
        return self.final.shape[1]


def _round_up(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def time_sync_from_fsa(fsa: DenseFsa, state_frame: np.ndarray):
    """(frame-sorted arc arrays, n_frames, per-frame state counts, finals).

    Returns (arcs, n_frames, counts, finals) where ``arcs`` is a tuple of
    flat arrays (frame_of_arc, src_slot, dst_slot, pdf, w) SORTED by frame —
    fully vectorized (a per-frame Python loop here cost seconds per batch on
    the on-the-fly hot path) — and ``finals`` are the last frame's slot
    weights.
    """
    state_frame = np.asarray(state_frame)
    n_frames = int(state_frame.max())
    # slot index = rank of the state within its frame (state ids ascend)
    order = np.argsort(state_frame, kind="stable")
    slot = np.zeros_like(state_frame)
    counts = np.bincount(state_frame, minlength=n_frames + 1)
    starts = np.cumsum(counts) - counts
    slot[order] = np.arange(len(state_frame)) - starts[state_frame[order]]

    src = np.asarray(fsa.src)
    dst = np.asarray(fsa.dst)
    src_f = state_frame[src]
    if np.any(state_frame[dst] != src_f + 1):
        raise ValueError("lattice is not time-synchronous (arc skips frames)")
    a_order = np.argsort(src_f, kind="stable")
    arcs = (src_f[a_order], slot[src[a_order]], slot[dst[a_order]],
            np.asarray(fsa.pdf)[a_order],
            np.nan_to_num(np.asarray(fsa.weight)[a_order], neginf=NEG_INF))
    finals = np.nan_to_num(
        np.asarray(fsa.final)[state_frame == n_frames], neginf=NEG_INF)
    return arcs, n_frames, counts, finals


def pack_time_sync(lattices: Sequence[Tuple[DenseFsa, np.ndarray]],
                   t_pad: Optional[int] = None,
                   bucket: bool = True) -> TimeSyncLattice:
    """Pad per-utterance time-sync lattices to a common [B, T, A]/[B, K]."""
    per_utt = [time_sync_from_fsa(fsa, frames) for (fsa, frames) in lattices]
    t_max = max(nf for (_a, nf, _c, _f) in per_utt)
    if t_pad is None:
        t_pad = t_max
    if t_pad < t_max:
        raise ValueError(f"t_pad {t_pad} < longest lattice {t_max}")
    k_max = max(int(c.max()) for (_a, _nf, c, _f) in per_utt)
    a_max = 1
    for (arcs, _nf, _c, _f) in per_utt:
        frame_of_arc = arcs[0]
        if frame_of_arc.size:
            a_max = max(a_max, int(np.bincount(frame_of_arc).max()))
    if bucket:
        k_max, a_max = _round_up(k_max), _round_up(a_max, 64)
    b = len(per_utt)
    src = np.zeros((b, t_pad, a_max), np.int32)
    dst = np.zeros((b, t_pad, a_max), np.int32)
    pdf = np.zeros((b, t_pad, a_max), np.int32)
    w = np.full((b, t_pad, a_max), NEG_INF, np.float32)
    final = np.full((b, k_max), NEG_INF, np.float32)
    for i, (arcs, nf, _counts, fin) in enumerate(per_utt):
        frame_of_arc, s, d, p, ww = arcs
        if frame_of_arc.size:
            # vectorized scatter: (frame, rank-within-frame) per arc
            fcounts = np.bincount(frame_of_arc, minlength=nf)
            fstarts = np.cumsum(fcounts) - fcounts
            rank = np.arange(frame_of_arc.size) - fstarts[frame_of_arc]
            src[i, frame_of_arc, rank] = s
            dst[i, frame_of_arc, rank] = d
            pdf[i, frame_of_arc, rank] = p
            w[i, frame_of_arc, rank] = ww
        final[i, : len(fin)] = fin
    return TimeSyncLattice(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(pdf),
                           jnp.asarray(w), jnp.asarray(final))


def pad_time_sync(lat: TimeSyncLattice, k: int, a: int,
                  t: Optional[int] = None) -> TimeSyncLattice:
    """Grow a packed lattice's slot/arc/frame paddings (exact no-op arcs).

    Multihost runs must compile identical psum-bearing step programs on
    every process, so each host pads its locally-packed lattices up to the
    allgather-max (K, A) — and, when ranks draw batches from DIFFERENT
    buckets, the frame axis T too — before the jitted step.  Frames past an
    utterance's ``num_frames`` are skipped by the scan's active mask, so
    T padding (NEG_INF arcs) never touches the math.
    """
    k0, a0, t0 = lat.num_slots, lat.src.shape[2], lat.src.shape[1]
    if t is None:
        t = t0
    if k < k0 or a < a0 or t < t0:
        raise ValueError(
            f"cannot shrink padding ({k0},{a0},{t0}) → ({k},{a},{t})")
    if (k, a, t) == (k0, a0, t0):
        return lat
    pad_a = [(0, 0), (0, t - t0), (0, a - a0)]
    return TimeSyncLattice(
        jnp.pad(lat.src, pad_a), jnp.pad(lat.dst, pad_a), jnp.pad(lat.pdf, pad_a),
        jnp.pad(lat.weight, pad_a, constant_values=NEG_INF),
        jnp.pad(lat.final, [(0, 0), (0, k - k0)], constant_values=NEG_INF))


# per-row segment sum and per-arc accuracy labels are shared with the
# generic per-utterance kernels
_seg_sum_slots = _seg_sum_b


# ---------------------------------------------------------------------------
# Arc→pdf reduction routing.  The [T*B, A]→[T*B, P] segment-sum is the
# single largest cost of the banded backward on chip: XLA's scatter-add
# runs at ~27M elements/s on v5e (xprof r4; 425 ms of the 719 ms MMI
# fwd+grad at the on-the-fly shape B=32/T=448/A=800).  When the
# denominator graph's DISTINCT pdf-id set is small and statically known —
# true for every structured den graph this repo ships (123 pdf ids for
# the 41-phone bigram den, 126 at the 5k-word midscale) — the scatter
# collapses to two EXACT one-hot GEMMs: arc values → local pdf lane
# (width ≤512, padded to 128) and a constant [L, P] expansion.  One-hot
# dots under HIGHEST are exact (each output sums distinct f32 products),
# so only the f32 accumulation order differs from the scatter.
# ---------------------------------------------------------------------------

_DEN_PDF_IDS: "np.ndarray | None" = None


def set_den_pdf_ids(ids) -> None:
    """Declare the STATIC pdf-id set of the denominator graph (or None to
    clear).  A trace-time routing hint, read like the PK2_* env gates:
    functions traced while it is set route their arc→pdf reductions
    through the one-hot GEMM form when the set is small (≤512 ids).

    Every lattice arc passed to the banded kernels must then emit a pdf
    from this set (true by construction for lattices decoded over the
    declared graph, host or device decoder alike); out-of-set arcs would
    contribute ZERO in the GEMM form instead of scatter-adding."""
    global _DEN_PDF_IDS
    if ids is None:
        _DEN_PDF_IDS = None
    else:
        _DEN_PDF_IDS = np.unique(np.asarray(ids).astype(np.int32))


def _arc_pdf_sums(vals_t, pdf_swapped, p_dim):
    """[T, B, A] arc values + [T, B, A] pdf ids → [T, B, P] sums.

    Routes per the module docstring above; the scatter fallback keeps the
    exact old semantics (and handles arbitrary pdf sets)."""
    t_len, b, a_dim = vals_t.shape
    ids = _DEN_PDF_IDS
    if (ids is None or len(ids) > 512
            or os.environ.get("PK2_LATFB_PDFSET") == "0"):
        return _seg_sum_slots(vals_t.reshape(t_len * b, a_dim),
                              pdf_swapped.reshape(t_len * b, a_dim),
                              p_dim).reshape(t_len, b, p_dim)
    l_real = len(ids)
    l_pad = -(-l_real // 128) * 128
    ids_row = jnp.asarray(ids, jnp.int32)
    # chunk frames so the [C, B, A, L] one-hot stays a few hundred MB
    per_frame = b * a_dim * l_pad * 4
    chunk = max(1, min(t_len, (256 << 20) // per_frame))
    n_chunk = -(-t_len // chunk)
    pad_t = n_chunk * chunk - t_len

    def padf(x):
        return jnp.pad(x, [(0, pad_t)] + [(0, 0)] * (x.ndim - 1)) \
            if pad_t else x

    vals_r = padf(vals_t).reshape(n_chunk, chunk, b, a_dim)
    pdf_r = padf(pdf_swapped).reshape(n_chunk, chunk, b, a_dim)

    def one(args):
        v_c, p_c = args
        onehot = (p_c[..., None] == ids_row).astype(jnp.float32)
        return jnp.einsum("cbal,cba->cbl",
                          jnp.pad(onehot, [(0, 0)] * 3 + [(0, l_pad - l_real)]),
                          v_c, precision=jax.lax.Precision.HIGHEST)

    loc = jax.lax.map(one, (vals_r, pdf_r))
    loc = loc.reshape(n_chunk * chunk, b, l_pad)[:t_len]
    expand = np.zeros((l_pad, p_dim), np.float32)
    expand[np.arange(l_real), ids] = 1.0
    return jnp.einsum("tbl,lp->tbp", loc, jnp.asarray(expand),
                      precision=jax.lax.Precision.HIGHEST)


def _obs_arcs_ts(obs, lat: TimeSyncLattice):
    """[B, T, num_pdfs] → per-arc obs [T, B, A] once, OUTSIDE the scans.

    Per-step take_along_axis from the full [B, num_pdfs] frame reads the
    whole observation row from HBM every sequential iteration; one
    vectorized gather here shrinks each step's traffic num_pdfs/A-fold
    (same fix as ops/fb_bigram._gather_obs — measured 5.4x on the bigram
    fwd+grad)."""
    return jnp.swapaxes(jnp.take_along_axis(obs, lat.pdf, axis=2), 0, 1)


def _alpha0_ts(lat: TimeSyncLattice, b, like):
    a = jnp.full((b, lat.num_slots), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    return a + 0.0 * jnp.sum(like * 0.0)


def _active_ts(lat: TimeSyncLattice, t_len, num_frames):
    ts = jnp.arange(t_len)
    return (ts[:, None] < num_frames[None, :]).astype(jnp.float32)[:, :, None]


# ---------------------------------------------------------------------------
# Matvec form of the banded recursion (MMI hot path)
#
# The scan bodies below pay ~0.2 ms/frame of per-iteration latency on chip:
# each step is a [B, A] gather + exp + segment-sum (an XLA scatter-add) —
# tiny tensors, long op chains (VERDICT r2 weak #4).  The same cure that won
# 7-12x on the loaded-graph path (ops/fb_dense.py) applies banded: fold each
# frame's arc band into an exp-space transition matrix
#   M[t, b, k, k'] = sum_{a: src=k, dst=k'} exp(w + obs - mx[t, b])
# with ONE batched segment-sum over [T*B*A] OUTSIDE the scan (parallel in T,
# throughput-bound — the hoisting rule of DESIGN.md "Scan bodies must be
# lean"), and the scan step collapses to a single renormalized batched
# matvec on the MXU: no in-scan gather, no in-scan scatter.  The backward
# runs the transposed-matvec scan and computes ALL arc posteriors in one
# batched pass afterwards.  Memory: M is [T, B, K, K] f32 (3.8 GB at the
# worst-case on-the-fly shape B=32/T=448/K=256), rebuilt — not saved —
# between forward and backward; the auto gate below falls back to the scan
# form past ``PK2_LATFB_MATVEC_BYTES``.
# ---------------------------------------------------------------------------


def use_matvec_latfb(t_len: int, b: int, k: int, n_mats: int = 1) -> bool:
    """Route the banded kernels through the matvec form?

    ``PK2_LATFB_MATVEC``: 1 forces on, 0 forces off; unset = auto (on when
    the ``n_mats`` [T, B, K, K] transition tensors fit the byte budget
    ``PK2_LATFB_MATVEC_BYTES``, default 8 GiB, and the flat index fits s32).
    The sMBR/MPE recursion carries a second (accuracy-weighted) matrix, so
    it gates with ``n_mats=2``.

    Precedence (ADVICE r3): an explicit ``PK2_LATFB_MATVEC=0/1`` always
    wins; otherwise an explicit ``PK2_PALLAS_LATFB=1`` opt-in disables the
    matvec auto-default so the Pallas path is actually reachable; otherwise
    auto.

    NOTE (round 5 session 3): the MMI callers consult ``use_pallas_latfb``
    BEFORE this gate — on the TPU backend the Pallas kernels are the
    default MMI route (bit-exact vs the scan form, 2.6x the matvec form at
    the compacted OTF shape), so this gate decides only the non-Pallas
    shapes and the sMBR/MPE recursions.  The r3 "matvec beats scan"
    ranking has also INVERTED at the lat_mmi bench shape since the
    arc→pdf one-hot GEMM route (scan 107 ms vs matvec 208 on chip).
    """
    env = os.environ.get("PK2_LATFB_MATVEC")
    if env == "":
        env = None            # `PK2_LATFB_MATVEC= cmd` idiom = unset
    if env is not None and env not in ("0", "1"):
        raise ValueError(f"PK2_LATFB_MATVEC={env!r}: expected 0 or 1")
    if env == "0":
        return False
    flat = t_len * b * k * k
    if flat >= 2**31:  # segment ids are s32
        return False
    if env == "1":
        return True
    if os.environ.get("PK2_PALLAS_LATFB") == "1":
        return False          # explicit Pallas opt-in beats the auto default
    if not _MATVEC_DEFAULT_ON:
        return False
    # default 8 GiB (ADVICE r3): the measured sMBR win shape (B=32/T=448/
    # K=256, n_mats=2 -> 7.34 GB, 407 ms on chip r3 session 7) must engage
    # by default; the matrices are rebuilt, not saved, between fwd and bwd
    budget = int(os.environ.get("PK2_LATFB_MATVEC_BYTES",
                                str(8 * 1024**3)))
    return 4 * flat * n_mats <= budget


# On-chip timing (round 3, v5e, worst-case dense bands B=32/T=448/K=A=256,
# P=8952): MMI fwd+grad 277 -> 252 ms (42.1 -> 46.3 utt/s), sMBR 452 ->
# 407 ms (25.8 -> 28.6 utt/s) — the matvec form wins both, so auto is ON
# within the byte budget (repo rule: no perf-path default changes without
# an on-TPU measurement).
_MATVEC_DEFAULT_ON = True


def _band_lin_ts(obs_arc, lat: TimeSyncLattice):
    """Shared matvec-builder front half: (lin [T,B,A], mx [T,B], idx).

    ``lin`` is each arc's exp-space weight exp(w + obs - mx), ``idx`` its
    flat (frame, batch, src, dst) scatter target.  Padding arcs (weight
    NEG_INF) are masked explicitly — exp(NEG_INF - NEG_INF) would otherwise
    read 1 on all-padding frames.
    """
    t_len, b, _a = obs_arc.shape
    k = lat.num_slots
    w = jnp.swapaxes(lat.weight, 0, 1) + obs_arc              # [T, B, A]
    live = w > 0.5 * NEG_INF
    mx = jnp.max(jnp.where(live, w, NEG_INF), axis=2)         # [T, B]
    mx = jnp.where(mx > 0.5 * NEG_INF, mx, 0.0)
    lin = jnp.where(live, jnp.exp(w - mx[:, :, None]), 0.0)
    rows = (jnp.arange(t_len * b, dtype=jnp.int32) * (k * k)).reshape(
        t_len, b, 1)
    idx = rows + jnp.swapaxes(lat.src, 0, 1) * k + jnp.swapaxes(lat.dst, 0, 1)
    return lin, mx, idx


def _trans_build_mode() -> str:
    """PK2_LATFB_BUILD=scatter|einsum|auto — transition-matrix builder.

    ``scatter``: one segment-sum over [T*B*A] flat (frame, batch, src, dst)
    cells — scatter-RATE-bound (~27M elem/s on v5e: 423 ms of the 856 ms
    on-the-fly train step at B=32/T=448/A=800, xprof r4). ``einsum``: chunked
    one-hot matmuls on the MXU — M[t,b] = U^T V with U[a,i] = lin_a·δ(src_a=i),
    V[a,j] = δ(dst_a=j); every product is lin·{0,1} so each partial is exact
    in any GEMM decomposition and only the f32 accumulation order differs
    from the scatter (~1 ulp). ``auto`` (default): einsum — measured on
    chip round 5 at the on-the-fly shape B=32/T=448/A=800/K=256: MMI
    fwd+grad 830 → 726 ms standalone, 741 → 637 ms stacked with the
    pdf-set GEMM gamma route (BASELINE.md round 5).
    """
    env = os.environ.get("PK2_LATFB_BUILD", "auto")
    if env not in ("scatter", "einsum", "auto"):
        raise ValueError(f"PK2_LATFB_BUILD={env!r}: expected "
                         "scatter|einsum|auto")
    if env == "auto":
        return "einsum"
    return env


def _trans_mats_einsum(lin, lat: TimeSyncLattice, arc_acc, t_len, b, k):
    """One-hot-einsum transition-matrix build (see _trans_build_mode).

    Chunked over frames so the [C, B, A, K] one-hot operands stay a few
    hundred MB regardless of T."""
    a = lin.shape[2]
    per_frame = b * a * k * 4
    chunk = max(1, min(t_len, (256 << 20) // per_frame))
    n_chunk = -(-t_len // chunk)
    pad_t = n_chunk * chunk - t_len

    def pad(x):
        return jnp.pad(x, [(0, pad_t)] + [(0, 0)] * (x.ndim - 1)) \
            if pad_t else x

    src = pad(jnp.swapaxes(lat.src, 0, 1)).reshape(n_chunk, chunk, b, a)
    dst = pad(jnp.swapaxes(lat.dst, 0, 1)).reshape(n_chunk, chunk, b, a)
    lin_r = pad(lin).reshape(n_chunk, chunk, b, a)
    acc_r = (pad(lin * arc_acc).reshape(n_chunk, chunk, b, a)
             if arc_acc is not None else None)
    slots = jnp.arange(k, dtype=jnp.int32)

    def one(args):
        lin_c, src_c, dst_c, acc_c = args
        v = (dst_c[..., None] == slots).astype(jnp.float32)   # [C,B,A,K]
        u = jnp.where(src_c[..., None] == slots,
                      lin_c[..., None], 0.0)                  # [C,B,A,K]
        m = jnp.einsum("cbai,cbaj->cbij", u, v,
                       precision=jax.lax.Precision.HIGH)
        if acc_c is None:
            return m, jnp.zeros((0,), jnp.float32)
        u2 = jnp.where(src_c[..., None] == slots, acc_c[..., None], 0.0)
        m2 = jnp.einsum("cbai,cbaj->cbij", u2, v,
                        precision=jax.lax.Precision.HIGH)
        return m, m2

    if acc_r is not None:
        m, m2 = jax.lax.map(one, (lin_r, src, dst, acc_r))
        m = m.reshape(n_chunk * chunk, b, k, k)[:t_len]
        return m, m2.reshape(n_chunk * chunk, b, k, k)[:t_len]
    m, _ = jax.lax.map(lambda xs: one((xs[0], xs[1], xs[2], None)),
                       (lin_r, src, dst))
    return m.reshape(n_chunk * chunk, b, k, k)[:t_len], None


def _trans_mats_ts(obs_arc, lat: TimeSyncLattice, arc_acc=None):
    """Per-frame exp-space transition matrices: ([T, B, K, K], mx [T, B]).

    With ``arc_acc`` [T, B, A], also returns the accuracy-weighted matrix
    M2[t, b, k, k'] = sum lin * acc (the sMBR recursion's second operand).
    """
    t_len, b, _a = obs_arc.shape
    k = lat.num_slots
    lin, mx, idx = _band_lin_ts(obs_arc, lat)
    if _trans_build_mode() == "einsum":
        m, m2 = _trans_mats_einsum(lin, lat, arc_acc, t_len, b, k)
        if arc_acc is None:
            return m, mx
        return m, m2, mx
    m = jax.ops.segment_sum(lin.reshape(-1), idx.reshape(-1),
                            num_segments=t_len * b * k * k)
    m = m.reshape(t_len, b, k, k)
    if arc_acc is None:
        return m, mx
    m2 = jax.ops.segment_sum((lin * arc_acc).reshape(-1), idx.reshape(-1),
                             num_segments=t_len * b * k * k)
    return m, m2.reshape(t_len, b, k, k), mx


def _latfb_unroll() -> int:
    """PK2_LATFB_UNROLL=n: unroll the matvec alpha/beta scans so XLA fuses
    the renorm epilogues across frame boundaries — the scan bodies are 5-6
    tiny ops each and run dispatch-bound (~0.3 ms/iteration on v5e for a
    [32,256]x[32,256,256] matvec step).  1 (off) until chip-measured."""
    return int(os.environ.get("PK2_LATFB_UNROLL", "1"))


def _logz_fwd_matvec_ts(obs, lat: TimeSyncLattice, num_frames):
    """Matvec-form forward; residuals in the scan path's convention
    (alphas = per-frame max-normalized logs, norms = cumulative shifts)."""
    b, t_len, _p = obs.shape
    mats, mx = _trans_mats_ts(_obs_arcs_ts(obs, lat), lat)

    def step(carry, inp):
        ah, n = carry                                          # [B,K], [B]
        m_t, mx_t, t = inp
        nxt = jnp.einsum("bk,bkl->bl", ah, m_t,
                         precision=jax.lax.Precision.HIGHEST)
        m2 = jnp.max(nxt, axis=1, keepdims=True)
        m2s = jnp.where(m2 > 0.0, m2, 1.0)
        new_ah = nxt / m2s
        new_n = n + mx_t + jnp.log(m2s[:, 0])
        active = (t < num_frames)[:, None]
        ah = jnp.where(active, new_ah, ah)
        n = jnp.where(active[:, 0], new_n, n)
        return (ah, n), (ah, n)

    ah0 = jnp.zeros((b, lat.num_slots), jnp.float32).at[:, 0].set(1.0)
    ah0 = ah0 + 0.0 * jnp.sum(obs * 0.0)
    n0 = jnp.zeros((b,), jnp.float32) + 0.0 * ah0[:, 0]
    (ah_T, n_T), (ahs, norms) = jax.lax.scan(
        step, (ah0, n0), (mats, mx, jnp.arange(t_len)),
        unroll=_latfb_unroll())
    total = jnp.maximum(_log_safe(ah_T) + lat.final, NEG_INF)
    logz = jax.nn.logsumexp(total, axis=1) + n_T
    return logz, (_log_safe(ahs), norms)


def _occupancies_matvec_ts(obs, lat: TimeSyncLattice, num_frames, logz,
                           alphas, norms):
    """Matvec-form occupancies: transposed-matvec beta scan + ONE batched
    arc-gamma pass + the existing batched arc→pdf segment-sum."""
    b, t_len, p_dim = obs.shape
    obs_arc = _obs_arcs_ts(obs, lat)
    mats, mx = _trans_mats_ts(obs_arc, lat)

    def step(carry, inp):
        bh, bn = carry                                         # beta at t+1
        m_t, mx_t, t = inp
        nxt = jnp.einsum("bkl,bl->bk", m_t, bh,
                         precision=jax.lax.Precision.HIGHEST)
        m2 = jnp.max(nxt, axis=1, keepdims=True)
        m2s = jnp.where(m2 > 0.0, m2, 1.0)
        new_bh = nxt / m2s
        new_bn = bn + mx_t + jnp.log(m2s[:, 0])
        active = (t < num_frames)[:, None]
        out = (bh, bn)           # the t+1-side carry gamma needs at step t
        bh = jnp.where(active, new_bh, bh)
        bn = jnp.where(active[:, 0], new_bn, bn)
        return (bh, bn), out

    bm0 = jnp.max(lat.final, axis=1, keepdims=True)
    bm0 = jnp.where(bm0 > 0.5 * NEG_INF, bm0, 0.0)
    bh0 = jnp.where(lat.final > 0.5 * NEG_INF,
                    jnp.exp(lat.final - bm0), 0.0) + 0.0 * alphas[0]
    bn0 = bm0[:, 0] + 0.0 * norms[0]
    _, (bhs, bns) = jax.lax.scan(step, (bh0, bn0),
                                 (mats, mx, jnp.arange(t_len)), reverse=True,
                                 unroll=_latfb_unroll())
    # one batched arc-gamma pass, parallel in T (no per-step gathers)
    a0 = _alpha0_ts(lat, b, obs)
    alpha_prev = jnp.concatenate([a0[None], alphas[:-1]], axis=0)
    anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32),
                                  norms[:-1]], axis=0)
    src_t = jnp.swapaxes(lat.src, 0, 1)
    dst_t = jnp.swapaxes(lat.dst, 0, 1)
    w_t = jnp.swapaxes(lat.weight, 0, 1)
    log_gamma = (jnp.take_along_axis(alpha_prev, src_t, axis=2)
                 + anorm_prev[:, :, None] + w_t + obs_arc
                 + jnp.take_along_axis(_log_safe(bhs), dst_t, axis=2)
                 + bns[:, :, None] - logz[None, :, None])
    active = (jnp.arange(t_len)[:, None] < num_frames[None, :])
    gammas_arc = jnp.where(active[:, :, None],
                           jnp.exp(jnp.minimum(log_gamma, 0.0)), 0.0)
    gammas = _arc_pdf_sums(gammas_arc, jnp.swapaxes(lat.pdf, 0, 1), p_dim)
    return jnp.swapaxes(gammas, 0, 1)


def _arc_acc_ts(lat: TimeSyncLattice, ref, level, pdf_to_phone, silence):
    """Per-arc frame accuracies for ALL frames at once: [T, B, A]."""
    b, t_len, a = lat.pdf.shape
    pdf_t = jnp.swapaxes(lat.pdf, 0, 1).reshape(t_len * b, a)
    ref_t = jnp.swapaxes(ref, 0, 1).reshape(t_len * b)
    return _arc_acc_b(pdf_t, ref_t, level, pdf_to_phone,
                      silence).reshape(t_len, b, a)


def _smbr_fwd_matvec_ts(obs, lat: TimeSyncLattice, ref, num_frames, level,
                        pdf_to_phone, silence):
    """Matvec-form expected-accuracy forward (three matvecs per frame; the
    acc recursion factors as numer = (ah*ac)@M + ah@M2, denom = ah@M)."""
    b, t_len, _p = obs.shape
    arc_acc = _arc_acc_ts(lat, ref, level, pdf_to_phone, silence)
    mats, mats2, mx = _trans_mats_ts(_obs_arcs_ts(obs, lat), lat, arc_acc)
    hi = jax.lax.Precision.HIGHEST

    def step(carry, inp):
        ah, ac, n = carry
        m_t, m2_t, mx_t, t = inp
        d = jnp.einsum("bk,bkl->bl", ah, m_t, precision=hi)
        nm = (jnp.einsum("bk,bkl->bl", ah * ac, m_t, precision=hi)
              + jnp.einsum("bk,bkl->bl", ah, m2_t, precision=hi))
        new_ac = jnp.where(d > 0.0, nm / jnp.where(d > 0.0, d, 1.0), 0.0)
        m2v = jnp.max(d, axis=1, keepdims=True)
        m2s = jnp.where(m2v > 0.0, m2v, 1.0)
        new_ah = d / m2s
        new_n = n + mx_t + jnp.log(m2s[:, 0])
        active = (t < num_frames)[:, None]
        ah = jnp.where(active, new_ah, ah)
        ac = jnp.where(active, new_ac, ac)
        n = jnp.where(active[:, 0], new_n, n)
        return (ah, ac, n), (ah, ac, n)

    ah0 = jnp.zeros((b, lat.num_slots), jnp.float32).at[:, 0].set(1.0)
    ah0 = ah0 + 0.0 * jnp.sum(obs * 0.0)
    ac0 = jnp.zeros((b, lat.num_slots), jnp.float32) + 0.0 * ah0
    n0 = jnp.zeros((b,), jnp.float32) + 0.0 * ah0[:, 0]
    (ah_T, ac_T, n_T), (ahs, acs, norms) = jax.lax.scan(
        step, (ah0, ac0, n0), (mats, mats2, mx, jnp.arange(t_len)))
    total = jnp.maximum(_log_safe(ah_T) + lat.final, NEG_INF)
    w = jax.nn.softmax(total, axis=1)
    f = jnp.sum(w * ac_T, axis=1)
    logz = jax.nn.logsumexp(total, axis=1) + n_T
    return f, (_log_safe(ahs), acs, norms, logz, f)


def _smbr_bwd_matvec_ts(obs, lat: TimeSyncLattice, ref, num_frames, level,
                        pdf_to_phone, silence, alphas, aaccs, norms, logz, f):
    """Matvec-form expected-accuracy gradient: transposed-matvec beta/bacc
    scan, then ONE batched arc pass for gamma * (c_arc - f)."""
    b, t_len, p_dim = obs.shape
    obs_arc = _obs_arcs_ts(obs, lat)
    arc_acc = _arc_acc_ts(lat, ref, level, pdf_to_phone, silence)
    mats, mats2, mx = _trans_mats_ts(obs_arc, lat, arc_acc)
    hi = jax.lax.Precision.HIGHEST

    def step(carry, inp):
        bh, bc, bn = carry
        m_t, m2_t, mx_t, t = inp
        out = (bh, bc, bn)                # the t+1-side carry
        d = jnp.einsum("bkl,bl->bk", m_t, bh, precision=hi)
        nm = (jnp.einsum("bkl,bl->bk", m_t, bc * bh, precision=hi)
              + jnp.einsum("bkl,bl->bk", m2_t, bh, precision=hi))
        new_bc = jnp.where(d > 0.0, nm / jnp.where(d > 0.0, d, 1.0), 0.0)
        m2v = jnp.max(d, axis=1, keepdims=True)
        m2s = jnp.where(m2v > 0.0, m2v, 1.0)
        new_bh = d / m2s
        new_bn = bn + mx_t + jnp.log(m2s[:, 0])
        active = (t < num_frames)[:, None]
        bh = jnp.where(active, new_bh, bh)
        bc = jnp.where(active, new_bc, bc)
        bn = jnp.where(active[:, 0], new_bn, bn)
        return (bh, bc, bn), out

    bm0 = jnp.max(lat.final, axis=1, keepdims=True)
    bm0 = jnp.where(bm0 > 0.5 * NEG_INF, bm0, 0.0)
    bh0 = jnp.where(lat.final > 0.5 * NEG_INF,
                    jnp.exp(lat.final - bm0), 0.0) + 0.0 * alphas[0]
    bc0 = jnp.zeros((b, lat.num_slots), jnp.float32) + 0.0 * alphas[0]
    bn0 = bm0[:, 0] + 0.0 * norms[0]
    _, (bhs, bcs, bns) = jax.lax.scan(
        step, (bh0, bc0, bn0), (mats, mats2, mx, jnp.arange(t_len)),
        reverse=True)
    a0 = _alpha0_ts(lat, b, obs)
    alpha_prev = jnp.concatenate([a0[None], alphas[:-1]], axis=0)
    aacc_prev = jnp.concatenate(
        [jnp.zeros((1, b, lat.num_slots), jnp.float32), aaccs[:-1]], axis=0)
    anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32),
                                  norms[:-1]], axis=0)
    src_t = jnp.swapaxes(lat.src, 0, 1)
    dst_t = jnp.swapaxes(lat.dst, 0, 1)
    w_t = jnp.swapaxes(lat.weight, 0, 1)
    log_gamma = (jnp.take_along_axis(alpha_prev, src_t, axis=2)
                 + anorm_prev[:, :, None] + w_t + obs_arc
                 + jnp.take_along_axis(_log_safe(bhs), dst_t, axis=2)
                 + bns[:, :, None] - logz[None, :, None])
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    c_arc = (jnp.take_along_axis(aacc_prev, src_t, axis=2) + arc_acc
             + jnp.take_along_axis(bcs, dst_t, axis=2))
    active = (jnp.arange(t_len)[:, None] < num_frames[None, :])
    contribs = jnp.where(active[:, :, None],
                         gamma * (c_arc - f[None, :, None]), 0.0)
    grads = _arc_pdf_sums(contribs, jnp.swapaxes(lat.pdf, 0, 1), p_dim)
    return jnp.swapaxes(grads, 0, 1)


def _logz_fwd_ts(obs, lat: TimeSyncLattice, num_frames):
    b, t_len, _p = obs.shape
    k = lat.num_slots

    from pykaldi2_tpu.ops.fb_lattice_pallas import (_pad128, make_logz_fwd,
                                                    use_pallas_latfb)

    # route precedence (round-5 session-3 on-chip verdict, BASELINE.md r5):
    # the one-hot Pallas kernels are BIT-EXACT vs the scan form and ~2x the
    # matvec form at the lat_mmi bench shape, so on TPU they go first; the
    # matvec form serves unsupported shapes (its auto byte-budget gate is
    # unchanged) and the scan form is the final fallback
    if use_pallas_latfb(b, k, lat.src.shape[2]):
        # fused Mosaic step: VMEM-resident alpha carry, one kernel per frame
        # instead of the scan's per-iteration dispatch chain (VERDICT r2
        # item 6); identical math/masking as the scan below.  Slot counts
        # are padded to the lane multiple (pad slots are inert: no arc
        # addresses them, see fb_lattice_pallas._pad128) and the residual
        # alphas sliced back so the bwd sees the caller's k.
        kp = _pad128(k)
        final_p = (lat.final if kp == k else
                   jnp.pad(lat.final, ((0, 0), (0, kp - k)),
                           constant_values=NEG_INF))
        alphas, norms = make_logz_fwd(kp)(
            _obs_arcs_ts(obs, lat),
            jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
            jnp.swapaxes(lat.weight, 0, 1), _active_ts(lat, t_len, num_frames))
        total = jnp.maximum(alphas[-1] + final_p, NEG_INF)
        logz = jax.nn.logsumexp(total, axis=1) + norms[-1]
        return logz, (alphas[..., :k], norms)

    if use_matvec_latfb(t_len, b, k):
        return _logz_fwd_matvec_ts(obs, lat, num_frames)

    def step(carry, inp):
        alpha, norm = carry
        obs_arc, src_t, dst_t, w_t, t = inp
        score = (jnp.take_along_axis(alpha, src_t, axis=1) + w_t
                 + obs_arc)                                          # [B, A]
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        summed = _seg_sum_slots(lin, dst_t, k)
        new_alpha = jnp.where(summed > 0,
                              jnp.log(jnp.where(summed > 0, summed, 1.0)),
                              NEG_INF) + mx
        m2 = jnp.max(new_alpha, axis=1, keepdims=True)
        new_alpha = new_alpha - m2
        new_norm = norm + m2[:, 0]
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        norm = jnp.where(active[:, 0], new_norm, norm)
        return (alpha, norm), (alpha, norm)

    alpha0 = _alpha0_ts(lat, b, obs)
    xs = (_obs_arcs_ts(obs, lat),
          jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
          jnp.swapaxes(lat.weight, 0, 1),
          jnp.arange(t_len))
    (alpha_T, norm_T), (alphas, norms) = jax.lax.scan(
        step, (alpha0, jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]), xs)
    total = jnp.maximum(alpha_T + lat.final, NEG_INF)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return logz, (alphas, norms)


@jax.custom_vjp
def lattice_logz_ts(obs, lat: TimeSyncLattice, num_frames):
    """Per-utterance log partition over banded lattices: [B]."""
    return _logz_fwd_ts(obs, lat, num_frames)[0]


def _logz_ts_fwd(obs, lat, num_frames):
    logz, (alphas, norms) = _logz_fwd_ts(obs, lat, num_frames)
    return logz, (obs, lat, num_frames, logz, alphas, norms)


def _logz_ts_bwd(res, ct):
    obs, lat, num_frames, logz, alphas, norms = res
    gamma = _occupancies_ts(obs, lat, num_frames, logz, alphas, norms)
    return (ct[:, None, None] * gamma, None, None)


def _occupancies_ts(obs, lat: TimeSyncLattice, num_frames, logz, alphas, norms):
    b, t_len, p_dim = obs.shape
    k = lat.num_slots

    from pykaldi2_tpu.ops.fb_lattice_pallas import (_pad128,
                                                    make_occupancies_bwd,
                                                    use_pallas_latfb)

    if use_pallas_latfb(b, k, lat.src.shape[2]):
        # same route precedence + pad-slot shim as _logz_fwd_ts
        kp = _pad128(k)

        def padk(x):
            return (x if kp == k else
                    jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, kp - k)],
                            constant_values=NEG_INF))

        alpha_prev = jnp.concatenate(
            [_alpha0_ts(lat, b, obs)[None], alphas[:-1]], axis=0)
        anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32),
                                      norms[:-1]], axis=0)
        gammas_arc = make_occupancies_bwd(kp)(
            _obs_arcs_ts(obs, lat),
            jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
            jnp.swapaxes(lat.weight, 0, 1), _active_ts(lat, t_len, num_frames),
            padk(alpha_prev), anorm_prev[:, :, None], padk(lat.final),
            logz[:, None])
        gammas = _arc_pdf_sums(gammas_arc, jnp.swapaxes(lat.pdf, 0, 1),
                               p_dim)
        return jnp.swapaxes(gammas, 0, 1)

    if use_matvec_latfb(t_len, b, k):
        return _occupancies_matvec_ts(obs, lat, num_frames, logz, alphas,
                                      norms)
    beta0 = lat.final + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]
    alpha_prev = jnp.concatenate([_alpha0_ts(lat, b, obs)[None], alphas[:-1]], axis=0)
    anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32), norms[:-1]], axis=0)

    def step(carry, inp):
        beta, bnorm = carry
        obs_arc, src_t, dst_t, w_t, a_prev, an_prev, t = inp
        score = w_t + obs_arc + jnp.take_along_axis(beta, dst_t, axis=1)
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        summed = _seg_sum_slots(lin, src_t, k)
        new_beta = jnp.where(summed > 0,
                             jnp.log(jnp.where(summed > 0, summed, 1.0)),
                             NEG_INF) + mx
        m2 = jnp.max(new_beta, axis=1, keepdims=True)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        log_gamma = (jnp.take_along_axis(a_prev, src_t, axis=1) + an_prev[:, None]
                     + w_t + obs_arc + jnp.take_along_axis(beta, dst_t, axis=1)
                     + bnorm[:, None] - logz[:, None])
        gamma_arc = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_arc = jnp.where(active, gamma_arc, 0.0)
        beta = jnp.where(active, new_beta_n, beta)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bnorm), gamma_arc

    xs = (_obs_arcs_ts(obs, lat),
          jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
          jnp.swapaxes(lat.weight, 0, 1),
          alpha_prev, anorm_prev, jnp.arange(t_len))
    _, gammas_arc = jax.lax.scan(step, (beta0, bnorm0), xs, reverse=True)
    # arc→pdf scatter as ONE batched segment-sum after the scan (parallel
    # in T) instead of a per-iteration [B, num_pdfs] scatter + HBM write
    gammas = _arc_pdf_sums(gammas_arc, jnp.swapaxes(lat.pdf, 0, 1), p_dim)
    return jnp.swapaxes(gammas, 0, 1)


lattice_logz_ts.defvjp(_logz_ts_fwd, _logz_ts_bwd)


def lattice_occupancies_ts(obs, lat: TimeSyncLattice, num_frames):
    logz, (alphas, norms) = _logz_fwd_ts(obs, lat, num_frames)
    gamma = _occupancies_ts(obs, lat, num_frames, logz, alphas, norms)
    return logz, gamma


# ---------------------------------------------------------------------------
# MMI over banded decoded lattices
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def mmi_objective_lattice_ts(obs, ali, lat: TimeSyncLattice, num_frames, mask,
                             drop_frames: bool = True, den_scale: float = 1.0):
    """MMI with banded per-utterance denominator lattices: [B] objectives."""
    safe = jnp.maximum(ali, 0)
    num = jnp.sum(jnp.take_along_axis(obs, safe[..., None], axis=-1)[..., 0] * mask, axis=-1)
    return num - den_scale * lattice_logz_ts(obs, lat, num_frames)


def _mmi_ts_fwd(obs, ali, lat, num_frames, mask, drop_frames, den_scale):
    logz, gamma = lattice_occupancies_ts(obs, lat, num_frames)
    safe = jnp.maximum(ali, 0)
    num = jnp.sum(jnp.take_along_axis(obs, safe[..., None], axis=-1)[..., 0] * mask, axis=-1)
    return num - den_scale * logz, (ali, mask, gamma)


def _mmi_ts_bwd(drop_frames, den_scale, res, ct):
    ali, mask, gamma = res
    safe = jnp.maximum(ali, 0)
    num_onehot = jax.nn.one_hot(safe, gamma.shape[-1], dtype=jnp.float32)
    grad = num_onehot - den_scale * gamma
    m = mask[..., None]
    if drop_frames:
        den_at_num = jnp.take_along_axis(gamma, safe[..., None], axis=-1)
        m = m * (den_at_num > 1e-20).astype(jnp.float32)
    return (ct[:, None, None] * grad * m, None, None, None, None)


mmi_objective_lattice_ts.defvjp(_mmi_ts_fwd, _mmi_ts_bwd)


# ---------------------------------------------------------------------------
# Expected accuracy (sMBR / MPE) over banded decoded lattices
# ---------------------------------------------------------------------------




@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6))
def lattice_expected_accuracy_ts(obs, lat: TimeSyncLattice, ref, num_frames,
                                 level: str = "pdf", pdf_to_phone=None,
                                 silence=None):
    """E[#correct frames] under the banded lattice posterior: [B].

    ``silence`` applies Kaldi's MpeVariants silence rules (fb.SilenceOpts).
    """
    f, _ = _smbr_fwd_ts(obs, lat, ref, num_frames, level, pdf_to_phone,
                        silence)
    return f


def _smbr_fwd_ts(obs, lat: TimeSyncLattice, ref, num_frames, level,
                 pdf_to_phone, silence=None):
    b, t_len, _p = obs.shape
    k = lat.num_slots

    from pykaldi2_tpu.ops.fb_lattice_pallas import (_pad128, make_smbr_fwd,
                                                    use_pallas_latfb)

    # same route precedence as _logz_fwd_ts: one-hot Pallas kernels first on
    # TPU (the acc recursion is the MMI recursion plus a linear carry; the
    # per-arc accuracies incl. silence rules are computed here in XLA and
    # streamed into the kernel as a [T,B,A] band), matvec for unsupported
    # shapes, scan as the final fallback
    if use_pallas_latfb(b, k, lat.src.shape[2], n_acc=2):
        kp = _pad128(k)
        arc_acc = _arc_acc_ts(lat, ref, level, pdf_to_phone, silence)
        alphas, aaccs, norms = make_smbr_fwd(kp)(
            _obs_arcs_ts(obs, lat),
            jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
            jnp.swapaxes(lat.weight, 0, 1), _active_ts(lat, t_len, num_frames),
            arc_acc)
        alphas = alphas[..., :k]
        aaccs = aaccs[..., :k]
        total = jnp.maximum(alphas[-1] + lat.final, NEG_INF)
        w = jax.nn.softmax(total, axis=1)
        f = jnp.sum(w * aaccs[-1], axis=1)
        logz = jax.nn.logsumexp(total, axis=1) + norms[-1]
        return f, (alphas, aaccs, norms, logz, f)

    if use_matvec_latfb(t_len, b, k, n_mats=2):
        return _smbr_fwd_matvec_ts(obs, lat, ref, num_frames, level,
                                   pdf_to_phone, silence)
    alpha0 = _alpha0_ts(lat, b, obs)
    acc0 = jnp.zeros((b, k), jnp.float32) + 0.0 * alpha0

    def step(carry, inp):
        alpha, aacc, norm = carry
        obs_arc, ref_t, src_t, dst_t, pdf_t, w_t, t = inp
        score = (jnp.take_along_axis(alpha, src_t, axis=1) + w_t
                 + obs_arc)
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        arc_acc = _arc_acc_b(pdf_t, ref_t, level, pdf_to_phone, silence)
        acc_in = jnp.take_along_axis(aacc, src_t, axis=1) + arc_acc
        denom = _seg_sum_slots(lin, dst_t, k)
        numer = _seg_sum_slots(lin * acc_in, dst_t, k)
        new_alpha = jnp.where(denom > 0,
                              jnp.log(jnp.where(denom > 0, denom, 1.0)),
                              NEG_INF) + mx
        new_acc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.max(new_alpha, axis=1, keepdims=True)
        new_alpha = new_alpha - m2
        new_norm = norm + m2[:, 0]
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        aacc = jnp.where(active, new_acc, aacc)
        norm = jnp.where(active[:, 0], new_norm, norm)
        return (alpha, aacc, norm), (alpha, aacc, norm)

    xs = (_obs_arcs_ts(obs, lat), jnp.swapaxes(ref, 0, 1),
          jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
          jnp.swapaxes(lat.pdf, 0, 1), jnp.swapaxes(lat.weight, 0, 1),
          jnp.arange(t_len))
    (alpha_T, acc_T, norm_T), (alphas, aaccs, norms) = jax.lax.scan(
        step, (alpha0, acc0, jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]), xs)
    total = jnp.maximum(alpha_T + lat.final, NEG_INF)
    w = jax.nn.softmax(total, axis=1)
    f = jnp.sum(w * acc_T, axis=1)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return f, (alphas, aaccs, norms, logz, f)


def _smbr_ts_fwd(obs, lat, ref, num_frames, level, pdf_to_phone, silence):
    f, res = _smbr_fwd_ts(obs, lat, ref, num_frames, level, pdf_to_phone,
                          silence)
    return f, (obs, lat, ref, num_frames, pdf_to_phone) + res


def _smbr_ts_bwd(level, silence, res, ct):
    obs, lat, ref, num_frames, pdf_to_phone, alphas, aaccs, norms, logz, f = res
    b, t_len, p_dim = obs.shape
    k = lat.num_slots

    from pykaldi2_tpu.ops.fb_lattice_pallas import (_pad128,
                                                    make_smbr_contribs_bwd,
                                                    use_pallas_latfb)

    if use_pallas_latfb(b, k, lat.src.shape[2], n_acc=2):
        # same route precedence + pad-slot shim as _smbr_fwd_ts; alpha-side
        # pads get NEG_INF (log domain), acc-side pads 0 (linear domain) —
        # both inert, no arc addresses a pad slot
        kp = _pad128(k)

        def padk(x, val):
            return (x if kp == k else
                    jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, kp - k)],
                            constant_values=val))

        arc_acc = _arc_acc_ts(lat, ref, level, pdf_to_phone, silence)
        alpha_prev = jnp.concatenate(
            [_alpha0_ts(lat, b, obs)[None], alphas[:-1]], axis=0)
        aacc_prev = jnp.concatenate(
            [jnp.zeros((1, b, k), jnp.float32), aaccs[:-1]], axis=0)
        anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32),
                                      norms[:-1]], axis=0)
        contribs = make_smbr_contribs_bwd(kp)(
            _obs_arcs_ts(obs, lat),
            jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
            jnp.swapaxes(lat.weight, 0, 1), _active_ts(lat, t_len, num_frames),
            arc_acc, padk(alpha_prev, NEG_INF), padk(aacc_prev, 0.0),
            anorm_prev[:, :, None], padk(lat.final, NEG_INF), logz[:, None],
            f[:, None])
        grads = _arc_pdf_sums(contribs, jnp.swapaxes(lat.pdf, 0, 1), p_dim)
        return (ct[:, None, None] * jnp.swapaxes(grads, 0, 1),
                None, None, None, None)

    if use_matvec_latfb(t_len, b, k, n_mats=2):
        grads = _smbr_bwd_matvec_ts(obs, lat, ref, num_frames, level,
                                    pdf_to_phone, silence, alphas, aaccs,
                                    norms, logz, f)
        return (ct[:, None, None] * grads, None, None, None, None)
    beta0 = lat.final + 0.0 * alphas[0]
    bacc0 = jnp.zeros((b, k), jnp.float32) + 0.0 * alphas[0]
    bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * norms[0]
    alpha_prev = jnp.concatenate([_alpha0_ts(lat, b, obs)[None], alphas[:-1]], axis=0)
    aacc_prev = jnp.concatenate([jnp.zeros((1, b, k), jnp.float32), aaccs[:-1]], axis=0)
    anorm_prev = jnp.concatenate([jnp.zeros((1, b), jnp.float32), norms[:-1]], axis=0)

    def step(carry, inp):
        beta, bacc, bnorm = carry
        obs_arc, ref_t, src_t, dst_t, pdf_t, w_t, a_prev, aa_prev, an_prev, t = inp
        arc_acc = _arc_acc_b(pdf_t, ref_t, level, pdf_to_phone, silence)
        beta_dst = jnp.take_along_axis(beta, dst_t, axis=1)
        log_gamma = (jnp.take_along_axis(a_prev, src_t, axis=1) + an_prev[:, None]
                     + w_t + obs_arc + beta_dst + bnorm[:, None] - logz[:, None])
        gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
        c_arc = (jnp.take_along_axis(aa_prev, src_t, axis=1) + arc_acc
                 + jnp.take_along_axis(bacc, dst_t, axis=1))
        contrib = gamma * (c_arc - f[:, None])
        active = (t < num_frames)[:, None]
        contrib = jnp.where(active, contrib, 0.0)
        score = w_t + obs_arc + beta_dst
        mx = jnp.maximum(jnp.max(score, axis=1, keepdims=True), NEG_INF)
        lin = jnp.exp(score - mx)
        acc_out = arc_acc + jnp.take_along_axis(bacc, dst_t, axis=1)
        denom = _seg_sum_slots(lin, src_t, k)
        numer = _seg_sum_slots(lin * acc_out, src_t, k)
        new_beta = jnp.where(denom > 0,
                             jnp.log(jnp.where(denom > 0, denom, 1.0)),
                             NEG_INF) + mx
        new_bacc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.max(new_beta, axis=1, keepdims=True)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        beta = jnp.where(active, new_beta_n, beta)
        bacc = jnp.where(active, new_bacc, bacc)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bacc, bnorm), contrib

    xs = (_obs_arcs_ts(obs, lat), jnp.swapaxes(ref, 0, 1),
          jnp.swapaxes(lat.src, 0, 1), jnp.swapaxes(lat.dst, 0, 1),
          jnp.swapaxes(lat.pdf, 0, 1), jnp.swapaxes(lat.weight, 0, 1),
          alpha_prev, aacc_prev, anorm_prev, jnp.arange(t_len))
    _, contribs = jax.lax.scan(step, (beta0, bacc0, bnorm0), xs, reverse=True)
    # arc→pdf scatter hoisted out of the scan (see _occupancies_ts)
    grads = _arc_pdf_sums(contribs, jnp.swapaxes(lat.pdf, 0, 1), p_dim)
    return (ct[:, None, None] * jnp.swapaxes(grads, 0, 1), None, None, None, None)


lattice_expected_accuracy_ts.defvjp(_smbr_ts_fwd, _smbr_ts_bwd)
