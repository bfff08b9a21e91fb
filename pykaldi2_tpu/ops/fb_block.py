"""Block-sparse forward-backward for graphs too big for the dense [S, S] form.

SURVEY.md §8 hard-part-1, third act (VERDICT r2 item 3). The dense
state-matmul kernels (ops/fb_dense.py) cap at 16k states — the [S, S] fp32
transition matrix is ~1 GB there, and a 12k-word HCLG already has 349k
states. Beyond the cap the generic arc-table kernels take over at ~7x the
cost (per-frame O(E) gathers/scatters, latency-bound). This module is the
middle path:

  * the [S, S] exp-space transition matrix is tiled into (k x k) blocks
    (k = 128, lane-aligned) and only NONZERO blocks are kept — compiler
    graphs are chain-structured, so after a BFS reordering of states most
    arcs sit on the (block) diagonal and the block count stays ~O(S/k);
  * the alpha/beta recursions run the same exp-space renormalized form as
    fb_dense, but each matvec is a gather -> batched [B,k]x[k,k] GEMM over
    blocks -> segment-sum, i.e. MXU work proportional to nnz blocks, not S^2;
  * activations do NOT materialize [T, B, S] (10 GB at 100k states, B=64,
    T=400): the forward is a two-level scan that saves alphas only at
    segment boundaries (seg_len frames apart) and the backward recomputes
    each segment's interior — O(sqrt(T)) memory, the standard remat
    trade (SURVEY.md "jax.checkpoint / rematerialisation").

State-emission invariant required (arcs into a state share its pdf), as for
fb_dense; `pack_graph_auto` routes: dense <= 16k states < block-sparse, with
the arc tables as the fallback for graphs violating the invariant or whose
block structure degenerates (wb memory cap).

Reference behavior: kaldi/src/lat/lattice-functions.cc forward-backward over
denominator graphs (SURVEY.md §3.2 "Kaldi lattice functions"), at loaded
`-den_graph` scale.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pykaldi2_tpu.ops.fb import (NEG_INF, SilenceOpts, frame_accuracy,
                                 log_safe as _log_safe_b)
from pykaldi2_tpu.ops.fb_dense import _gemm_precision, state_emission_pdfs
from pykaldi2_tpu.ops.fsa import DenseFsa
from pykaldi2_tpu.ops.lstm_pallas import _match_vma, _sds


class BlockSparseGraph(NamedTuple):
    """Nonzero (k x k) tiles of the exp-space transition matrix, both
    orientations (wbt holds the transposed tiles for the beta recursion),
    over BFS-reordered, k-padded states.

    Tiles are split two ways at pack time: tiles whose block offset
    ``bi - bj`` belongs to a small popular set live in the dense BAND
    (``band_off``/``wband``) and are applied as static-shift einsums with
    no dynamic indexing at all; the stragglers stay in the COO lists
    (``bi``/``bj``/``wb``) and go through the gather + segment-sum path.
    BFS makes compiler graphs near-block-diagonal, so the band typically
    covers everything and the COO lists are empty ([0, k, k])."""

    bi: jax.Array          # [nc] int32 source block row of each COO tile
    bj: jax.Array          # [nc] int32 destination block col (sorted by bj)
    wb: jax.Array          # [nc, k, k] f32 e^{w}, 0 = no arc
    bit: jax.Array         # [nct] transposed-list source block
    bjt: jax.Array         # [nct] transposed-list dest block (sorted)
    wbt: jax.Array         # [nct, k, k] transposed tiles
    band_off: tuple        # static int offsets o: out[:,j] += x[:,j+o]@Wb[j]
    wband: jax.Array       # [|band_off|, nblk, k, k] fwd band tiles
    band_off_t: tuple      # transposed-orientation offsets
    wband_t: jax.Array     # [|band_off_t|, nblk, k, k]
    state_pdf: jax.Array   # [Sp] int32 (padded states -> 0, never reached)
    final: jax.Array       # [Sp] f32 log-prob, NEG_INF on pads
    start: int             # state index in the reordered space
    num_states: int        # original S
    num_padded: int        # Sp = ceil(S / k) * k
    block: int             # k
    seg_len: int           # remat segment length (frames)
    state_phone: Optional[jax.Array] = None  # [Sp] int32 (MPE accuracy)


def _bfs_order(num_states: int, src: np.ndarray, dst: np.ndarray,
               start: int) -> np.ndarray:
    """perm[new] = old, BFS levels from start (stable within a level).

    Chains come out contiguous, so arcs concentrate near the block
    diagonal; unreachable states (connect() normally removed them) go last.
    """
    order = np.argsort(src, kind="stable")
    s_sorted, d_sorted = src[order], dst[order]
    row_start = np.searchsorted(s_sorted, np.arange(num_states))
    row_end = np.searchsorted(s_sorted, np.arange(num_states) + 1)
    level = np.full(num_states, -1, np.int64)
    level[start] = 0
    frontier = [start]
    lv = 0
    while frontier:
        nxt = []
        for s in frontier:
            for d in d_sorted[row_start[s]:row_end[s]]:
                if level[d] < 0:
                    level[d] = lv + 1
                    nxt.append(int(d))
        frontier = sorted(nxt)
        lv += 1
    level[level < 0] = lv + 1
    return np.lexsort((np.arange(num_states), level))


def pack_graph_blocks(fsa: DenseFsa, block: int = 128, seg_len: int = 16,
                      max_wb_bytes: int = 2 << 30,
                      band_frac: float = 0.5,
                      max_band: int = 8,
                      tile_dtype: Optional[str] = None) -> BlockSparseGraph:
    """DenseFsa -> BlockSparseGraph. Raises ValueError when the graph
    violates the state-emission invariant or the nonzero-block count blows
    past ``max_wb_bytes`` (callers fall back to the arc tables).

    ``band_frac``: a block offset joins the dense band when it holds at
    least ``band_frac * nblk`` tiles — each band offset costs a full
    [nblk, k, k] stream per matvec, so it pays once the offset's slots are
    about half full (the COO path reads each tile ~2x through its gather +
    segment-sum intermediates). ``band_frac=0`` disables banding (all-COO;
    the representation the opt-in Pallas kernel consumes).

    ``tile_dtype`` (default env ``PK2_BLOCKFB_TILE_DTYPE``; unset = bf16 on
    the TPU backend, f32 elsewhere): storage dtype of the tile tensors.
    "bfloat16" HALVES the recursion's dominant HBM stream — the
    [|O|, nblk, k, k] band re-read every frame — at a one-time ~0.4%
    relative rounding of each transition probability (the convert back to
    f32 fuses into the einsum read; accumulation stays f32). Measured on
    chip (r4, 96k-state graph, B=64/T=100 grad step): 220.6 → 206.8 ms on
    top of lincarry+fuseband, grad rel err 6e-5 alone / 3e-4 for the combo
    — default ON for TPU, f32 on CPU so the brute-force parity tests stay
    exact."""
    fsa.validate()
    state_pdf = state_emission_pdfs(fsa)
    if state_pdf is None:
        raise ValueError("graph violates the state-emission invariant "
                         "(arcs into one state carry different pdfs)")
    S = int(fsa.num_states)
    src = np.asarray(fsa.src, np.int64)
    dst = np.asarray(fsa.dst, np.int64)
    perm = _bfs_order(S, src, dst, int(fsa.start))      # perm[new] = old
    inv = np.empty(S, np.int64)
    inv[perm] = np.arange(S)
    src, dst = inv[src], inv[dst]
    state_pdf = state_pdf[perm]
    final = np.nan_to_num(np.asarray(fsa.final, np.float64)[perm],
                          neginf=NEG_INF, posinf=NEG_INF)
    state_phone = None
    if fsa.phone is not None:
        ph = np.asarray(fsa.phone)
        sp = np.full(S, -1, np.int64)
        sp[np.asarray(fsa.dst)] = ph
        if not np.any(sp[np.asarray(fsa.dst)] != ph):
            sp[sp < 0] = 0
            state_phone = sp[perm].astype(np.int32)

    Sp = -(-S // block) * block
    w = np.nan_to_num(np.asarray(fsa.weight, np.float64),
                      neginf=NEG_INF, posinf=NEG_INF)
    probs = np.where(w <= 0.5 * NEG_INF, 0.0,
                     np.exp(np.minimum(w, 80.0))).astype(np.float32)
    b_src, b_dst = src // block, dst // block
    pair = b_src * (Sp // block) + b_dst
    uniq, pair_idx = np.unique(pair, return_inverse=True)
    nb = len(uniq)
    wb = np.zeros((nb, block, block), np.float32)
    # duplicate arcs between one state pair add in prob space (exact lse)
    np.add.at(wb, (pair_idx, src % block, dst % block), probs)
    bi = (uniq // (Sp // block)).astype(np.int32)
    bj = (uniq % (Sp // block)).astype(np.int32)
    nblk = Sp // block

    def split_band(src_blk, dst_blk, tiles):
        """Popular offsets (src-dst) -> dense band [|O|, nblk, k, k];
        stragglers stay COO (sorted by dst block for the segment-sum)."""
        off = src_blk - dst_blk
        offs, counts = np.unique(off, return_counts=True)
        keep = offs[counts >= max(1, int(np.ceil(band_frac * nblk)))] \
            if band_frac > 0 else offs[:0]
        keep = keep[np.argsort(-counts[np.isin(offs, keep)])][:max_band]
        in_band = np.isin(off, keep)
        band = np.zeros((len(keep), nblk, block, block), np.float32)
        o_pos = {int(o): x for x, o in enumerate(keep)}
        for o, j, w in zip(off[in_band], dst_blk[in_band], tiles[in_band]):
            band[o_pos[int(o)], j] = w
        ci, cj, cw = (src_blk[~in_band], dst_blk[~in_band], tiles[~in_band])
        order = np.argsort(cj, kind="stable")
        return (tuple(int(o) for o in keep), band,
                ci[order], cj[order], np.ascontiguousarray(cw[order]))

    t_order = np.argsort(bi, kind="stable")     # transposed orientation
    bit_all, bjt_all = bj[t_order], bi[t_order]
    wbt_all = np.ascontiguousarray(wb[t_order].transpose(0, 2, 1))
    band_off, wband, bi_c, bj_c, wb_c = split_band(bi, bj, wb)
    band_off_t, wband_t, bit_c, bjt_c, wbt_c = split_band(
        bit_all, bjt_all, wbt_all)
    if not band_off:
        # the opt-in Pallas matvec only runs on all-COO packings and writes
        # output blocks only where a tile maps to them: block-cols with no
        # incoming tile (in either orientation) get a zero diagonal tile so
        # every output block is visited (kernel never leaves garbage in
        # HBM); numerically a no-op for the XLA path too
        miss = np.union1d(np.setdiff1d(np.arange(nblk), bj_c),
                          np.setdiff1d(np.arange(nblk), bi_c)).astype(np.int32)
        if len(miss):
            z = np.zeros((len(miss), block, block), np.float32)
            order = np.argsort(np.concatenate([bj_c, miss]), kind="stable")
            bi_c = np.concatenate([bi_c, miss])[order]
            bj_c = np.concatenate([bj_c, miss])[order]
            wb_c = np.concatenate([wb_c, z])[order]
            ordt = np.argsort(np.concatenate([bjt_c, miss]), kind="stable")
            bit_c = np.concatenate([bit_c, miss])[ordt]
            bjt_c = np.concatenate([bjt_c, miss])[ordt]
            wbt_c = np.concatenate([wbt_c, z])[ordt]
    n_slots = (len(bi_c) + len(bit_c)
               + (len(band_off) + len(band_off_t)) * nblk)
    if n_slots * block * block * 4 > max_wb_bytes:
        raise ValueError(
            f"block structure too dense: {n_slots} {block}x{block} tile "
            f"slots ({n_slots * block * block * 4 / 1e9:.1f} GB)")
    bi, bj, wb = bi_c, bj_c, wb_c
    bit, bjt, wbt = bit_c, bjt_c, wbt_c

    pad = Sp - S
    state_pdf = np.concatenate([state_pdf, np.zeros(pad, np.int64)])
    final = np.concatenate([final, np.full(pad, NEG_INF)])
    if state_phone is not None:
        state_phone = jnp.asarray(
            np.concatenate([state_phone, np.zeros(pad, np.int32)]))
    if tile_dtype is None:
        tile_dtype = os.environ.get("PK2_BLOCKFB_TILE_DTYPE")
    if tile_dtype is None:
        tile_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                      else "float32")
    if tile_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"tile_dtype={tile_dtype!r}: expected float32 or "
                         "bfloat16")
    tdt = jnp.dtype(tile_dtype)
    return BlockSparseGraph(
        bi=jnp.asarray(bi), bj=jnp.asarray(bj), wb=jnp.asarray(wb, tdt),
        bit=jnp.asarray(bit), bjt=jnp.asarray(bjt),
        wbt=jnp.asarray(wbt, tdt),
        band_off=band_off, wband=jnp.asarray(wband, tdt),
        band_off_t=band_off_t, wband_t=jnp.asarray(wband_t, tdt),
        state_pdf=jnp.asarray(state_pdf.astype(np.int32)),
        final=jnp.asarray(final, jnp.float32),
        start=int(inv[int(fsa.start)]), num_states=S, num_padded=Sp,
        block=block, seg_len=seg_len, state_phone=state_phone)


def _scan_unroll() -> int:
    """Unroll factor for the per-frame scans. MEASURED REGRESSION at >1 on
    chip (r3, B=64/T=100, 96k states: 444 ms at unroll=1 vs 624/635 ms at
    4/8) — the per-frame copy-starts xprof shows are overlapped async DMAs,
    not serial dispatch, and unrolling only grows the loop body past what
    fits the schedule. Default stays 1; the knob remains for re-testing on
    other shapes/toolchains."""
    return int(os.environ.get("PK2_BLOCKFB_UNROLL", "1"))


def _fuse_band() -> bool:
    """Apply all band offsets as ONE concatenated einsum instead of a
    per-offset einsum + add chain (same accumulation space — exp-domain
    sums — so the two forms agree to reassociation). Default ON after the
    r4 on-chip win: 252.7 → 241.2 ms alone, 242.7 → 220.6 ms on top of
    lincarry (96k-state graph, B=64/T=100 grad step) — the wider [B, nblk,
    |O|k] GEMM keeps the MXU busier than |O| narrow ones.
    PK2_BLOCKFB_FUSEBAND=0 restores the per-offset chain."""
    env = os.environ.get("PK2_BLOCKFB_FUSEBAND")
    if env not in (None, "", "0", "1"):
        raise ValueError(f"PK2_BLOCKFB_FUSEBAND={env!r}: expected 0 or 1")
    return env != "0"


def _use_pallas_block() -> bool:
    """Tile-streaming Pallas matvec, PK2_PALLAS_BLOCKFB=1 opt-in (read at
    trace time so tests can flip it after import). Default OFF everywhere:
    measured on chip (r3, B=64/T=100, 96k states, grad step) the kernel is
    489 ms vs 444 ms for the XLA gather/einsum/segment-sum form — the
    per-tile 32 KB x-block DMAs are latency-bound where XLA's bulk gather
    streams at ~350 GB/s. Kept (with interpret tests) as the base for a
    fused-frame kernel once Mosaic's lowering gaps close."""
    env = os.environ.get("PK2_PALLAS_BLOCKFB")
    if env not in (None, ""):
        if env not in ("0", "1"):
            raise ValueError(f"PK2_PALLAS_BLOCKFB={env!r}: expected 0 or 1")
        return env == "1"
    return False


def _bmv_kernel(i_ref, j_ref, x_ref, w_ref, o_ref):
    """One nonzero tile: o[j[n]] += x[i[n]] @ w[n]. Tiles arrive sorted by
    output block col, so Mosaic keeps the revisited output block in VMEM and
    writes it back to HBM exactly once, when j changes — the accumulator
    never round-trips."""
    n = pl.program_id(0)
    prev = jnp.where(n == 0, -1, j_ref[jnp.maximum(n - 1, 0)])

    @pl.when(j_ref[n] != prev)
    def _zero():
        o_ref[...] = jnp.zeros_like(o_ref)

    # HIGHEST, not _gemm_precision(): Mosaic's dot lowering rejects HIGH
    # (bf16x3), and the kernel is HBM-bound — exact fp32 costs nothing here
    o_ref[0] += jax.lax.dot_general(
        x_ref[0], w_ref[0], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _block_matvec_pallas(lin: jax.Array, tiles: jax.Array, i_idx: jax.Array,
                         j_idx: jax.Array, nblk: int, k: int) -> jax.Array:
    """[B, Sp] -> [B, Sp] through the tile-streaming kernel: one grid step
    per nonzero tile, scalar-prefetched block indices drive the x-gather and
    the output scatter as DMAs — the [B, nb, k] intermediate and the
    segment-sum pass of the XLA form never exist. Layout is block-major
    ([nblk, B, k]) so the block's trailing dims are (8,128)-aligned."""
    b = lin.shape[0]
    nb = tiles.shape[0]
    bp = -(-b // 8) * 8
    x = lin.reshape(b, nblk, k)
    if bp > b:
        x = jnp.pad(x, [(0, bp - b), (0, 0), (0, 0)])
    x = jnp.swapaxes(x, 0, 1)                                 # [nblk, bp, k]
    x, tiles, i_idx, j_idx = _match_vma(x, tiles, i_idx, j_idx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bp, k), lambda n, i, j: (i[n], 0, 0)),
            pl.BlockSpec((1, k, k), lambda n, i, j: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bp, k), lambda n, i, j: (j[n], 0, 0)),
    )
    out = pl.pallas_call(
        _bmv_kernel,
        grid_spec=grid_spec,
        out_shape=_sds((nblk, bp, k), jnp.float32, x),
    )(i_idx, j_idx, x, tiles)
    return jnp.swapaxes(out, 0, 1)[:b].reshape(b, nblk * k)


def _block_matvec(lin: jax.Array, g: BlockSparseGraph,
                  transpose: bool) -> jax.Array:
    """[B, Sp] nonneg linear values -> lin @ W (or @ W^T).

    Band part: out[:, j] += x[:, j+o] @ Wband[o, j] for each static offset
    o — the shift is a static slice XLA fuses into the einsum, so the whole
    band is dense GEMM traffic with NO dynamic indexing and no segment-sum.
    COO stragglers: gather block rows, batched [B,k]x[k,k] GEMM per tile,
    segment-sum into block cols (or the opt-in Pallas tile-streamer when
    the packing is all-COO)."""
    b = lin.shape[0]
    k, nblk = g.block, g.num_padded // g.block
    offs, band = ((g.band_off_t, g.wband_t) if transpose
                  else (g.band_off, g.wband))
    i_idx, j_idx, tiles = ((g.bit, g.bjt, g.wbt) if transpose
                           else (g.bi, g.bj, g.wb))
    if not offs and tiles.shape[0] and _use_pallas_block():
        if tiles.dtype != jnp.float32:
            raise ValueError(
                "PK2_PALLAS_BLOCKFB=1 needs float32 tiles; repack with "
                "PK2_BLOCKFB_TILE_DTYPE=float32 (bf16 is the TPU default "
                "since r4; the Pallas matvec has no bf16 path)")
        return _block_matvec_pallas(lin, tiles, i_idx, j_idx, nblk, k)
    xb = lin.reshape(b, nblk, k)
    out = None

    def shifted(o):
        if o > 0:
            return jnp.pad(xb[:, o:], [(0, 0), (0, o), (0, 0)])
        if o < 0:
            return jnp.pad(xb[:, :o], [(0, 0), (-o, 0), (0, 0)])
        return xb

    if len(offs) > 1 and _fuse_band():
        # all offsets in ONE einsum: [B, nblk, |O|k] x [nblk, |O|k, k] —
        # the per-offset partial sums and their adds disappear
        xcat = jnp.concatenate([shifted(o) for o in offs], axis=2)
        wcat = jnp.moveaxis(band, 0, 1).reshape(nblk, len(offs) * k, k)
        out = jnp.einsum("bnm,nml->bnl", xcat,
                         wcat.astype(jnp.float32),
                         precision=_gemm_precision())
    else:
        for oi, o in enumerate(offs):
            y = jnp.einsum("bnk,nkl->bnl", shifted(o),
                           band[oi].astype(jnp.float32),
                           precision=_gemm_precision())
            out = y if out is None else out + y
    if tiles.shape[0]:
        x = jnp.take(xb, i_idx, axis=1)                       # [B, nc, k]
        y = jnp.einsum("bnk,nkl->bnl", x, tiles.astype(jnp.float32),
                       precision=_gemm_precision())           # [B, nc, k]
        coo = jax.ops.segment_sum(jnp.swapaxes(y, 0, 1), j_idx,
                                  num_segments=nblk,
                                  indices_are_sorted=True)    # [nblk, B, k]
        coo = jnp.moveaxis(coo, 0, 1)
        out = coo if out is None else out + coo
    if out is None:
        out = jnp.zeros((b, nblk, k), lin.dtype)
    return out.reshape(b, g.num_padded)


def _log_matvec_b(x_log, g: BlockSparseGraph, transpose: bool = False):
    lin = jnp.exp(jnp.maximum(x_log, NEG_INF))
    s = _block_matvec(lin, g, transpose)
    return jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)), NEG_INF)


def _alpha_init_b(g: BlockSparseGraph, batch: int, like: jax.Array):
    a = jnp.full((batch, g.num_padded), NEG_INF, jnp.float32)
    a = a.at[:, g.start].set(0.0)
    return a + 0.0 * jnp.sum(like * 0.0)


def _lincarry() -> bool:
    """Carry alpha/beta LINEARLY (renormalized) through the MMI frame scans:
    the per-frame exp→matvec→log round-trip collapses to matvec→max→div,
    and the obs add becomes a multiply by exp(obs) gathered from a [B, P]
    table exp'd OUTSIDE the scan — ~3 fewer [B, Sp] elementwise passes per
    frame-pair. Semantically identical to the log carry: states >~87 nats
    under the frame max underflow exp() to exact 0 in BOTH forms (the log
    form exps inside `_log_matvec_b`). Default ON after the r4 on-chip win:
    252.7 → 242.7 ms alone, 220.6 ms with fuseband, 206.8 ms with bf16
    tiles (= 25.2 utt/s, 4.6× the arc tables; grad rel err 3e-4, from GEMM
    reassociation) at the 96k-state / B=64 / T=100 grad step.
    PK2_BLOCKFB_LINCARRY=0 restores the log carry. Saved activations stay
    in LOG form either way, so the gamma pass is mode-independent."""
    env = os.environ.get("PK2_BLOCKFB_LINCARRY")
    if env not in (None, "", "0", "1"):
        raise ValueError(f"PK2_BLOCKFB_LINCARRY={env!r}: expected 0 or 1")
    return env != "0"


def _defernorm() -> bool:
    """Defer each lincarry frame's [B, Sp] normalize-divide into the NEXT
    frame's [B, P] obs row (VERDICT r4 weak #6 attempt): the carry holds
    the UNNORMALIZED matvec output u plus its per-row max m, and the next
    frame divides its exp-obs row by m before the state_pdf gather —
    matvec(u/m)·eobs == matvec(u)·(eobs/m) by linearity, and P ≈ Sp/10 at
    the 96k-state bench graph, so one full [B, Sp] elementwise pass per
    frame-pair becomes a [B, P] one. Values stay bounded (u ≤ m_prev ≤ 1
    for stochastic transition rows). Saved activations are normalized at
    save time (log u − log m), so the saved format and the gamma pass are
    IDENTICAL to the non-deferred form. MMI logz/occupancy path only.
    Opt-in until measured on chip (repo rule)."""
    env = os.environ.get("PK2_BLOCKFB_DEFERNORM")
    if env not in (None, "", "0", "1"):
        raise ValueError(f"PK2_BLOCKFB_DEFERNORM={env!r}: expected 0 or 1")
    return env == "1"


def _exp_obs_b(obs):
    """[B, T, P] log scores → (exp(obs - m) [B, T, P], m [B, T]), computed
    once outside the frame scans (lean-scan-body rule)."""
    m = jnp.max(obs, axis=2)
    return jnp.exp(obs - m[:, :, None]), m


def _fwd_frame_lin(g: BlockSparseGraph, num_frames, carry, inp):
    """Linear-carry alpha frame: carry (ah normalized linear, norm)."""
    ah, norm = carry
    eobs_f, om_f, t = inp
    u = _block_matvec(ah, g, False) * eobs_f[:, g.state_pdf]
    m2 = jnp.max(u, axis=1, keepdims=True)
    m2s = jnp.where(m2 > 0.0, m2, 1.0)
    new_ah = u / m2s
    new_norm = norm + om_f + jnp.log(m2s[:, 0])
    active = (t < num_frames)[:, None]
    ah = jnp.where(active, new_ah, ah)
    norm = jnp.where(active[:, 0], new_norm, norm)
    return ah, norm


def _fwd_frame_lin_defer(g: BlockSparseGraph, num_frames, carry, inp):
    """Deferred-normalization alpha frame: carry (u unnormalized, norm,
    m [B,1]) with norm already including log m — see _defernorm."""
    u_prev, norm, m_prev = carry
    eobs_f, om_f, t = inp
    eobs_row = eobs_f / m_prev                         # [B, P]: the pass
    u = _block_matvec(u_prev, g, False) * eobs_row[:, g.state_pdf]
    m2 = jnp.max(u, axis=1, keepdims=True)
    m2s = jnp.where(m2 > 0.0, m2, 1.0)
    new_norm = norm + om_f + jnp.log(m2s[:, 0])
    active = (t < num_frames)[:, None]
    u_prev = jnp.where(active, u, u_prev)
    norm = jnp.where(active[:, 0], new_norm, norm)
    m_prev = jnp.where(active, m2s, m_prev)
    return u_prev, norm, m_prev


def _defer_saved(carry3):
    """(u, norm, m) → the NON-deferred saved form (log-normalized alpha,
    norm): log(u) − log(m), keeping the save format mode-independent."""
    u, norm, m = carry3
    return (jnp.where(u > 0,
                      jnp.log(jnp.where(u > 0, u, 1.0)) - jnp.log(m),
                      NEG_INF), norm)


def _full_save(g: BlockSparseGraph, b: int, t_len: int) -> bool:
    """True when the whole [T, B, Sp] alpha history fits the save budget:
    the backward then skips the per-segment recompute pass entirely — a
    full third of the matvec/gather/elementwise work (measured r3: the
    recompute scan is one of the three equal-cost frame passes). Segmented
    sqrt(T) remat stays for shapes past the budget (B=64/T=400/96k states
    is ~9.8 GB — bigger than the budget on a 16 GB chip)."""
    budget = int(os.environ.get("PK2_BLOCKFB_SAVE_BYTES", str(3 << 30)))
    return t_len * b * g.num_padded * 4 <= budget


def _full_save_smbr(g: BlockSparseGraph, b: int, t_len: int) -> bool:
    """sMBR saves TWO [T, B, Sp] histories (alpha + accumulator)."""
    budget = int(os.environ.get("PK2_BLOCKFB_SAVE_BYTES", str(3 << 30)))
    return 2 * t_len * b * g.num_padded * 4 <= budget


def _segmented_xs(obs, g: BlockSparseGraph, lin: bool = False):
    """[B,T,P] -> (per-frame input parts, ts [n_seg,C], n_seg), each part
    reshaped [n_seg, C, ...] with T padded to n_seg*C (padded frames are
    masked off by t < num_frames downstream). Parts are (obs,) in log mode
    and (exp_obs, obs_max) in linear-carry mode."""
    b, t_len, p = obs.shape
    c = g.seg_len
    n_seg = -(-t_len // c)
    tp = n_seg * c

    def seg(x):
        x = jnp.swapaxes(x, 0, 1)
        if tp > t_len:
            x = jnp.pad(x, [(0, tp - t_len)] + [(0, 0)] * (x.ndim - 1))
        return x.reshape((n_seg, c) + x.shape[1:])

    ts = jnp.arange(tp).reshape(n_seg, c)
    if lin:
        eobs, om = _exp_obs_b(obs)
        return (seg(eobs), seg(om)), ts, n_seg
    return (seg(obs),), ts, n_seg


def _fwd_frame(g: BlockSparseGraph, num_frames, carry, inp):
    """One alpha frame (shared by the outer fwd and the per-segment remat)."""
    alpha, norm = carry
    obs_f, t = inp
    obs_s = obs_f[:, g.state_pdf]                         # [B, Sp]
    new_alpha = _log_matvec_b(alpha, g) + obs_s
    m2 = jnp.maximum(jnp.max(new_alpha, axis=1, keepdims=True), NEG_INF)
    new_alpha = new_alpha - m2
    new_norm = norm + m2[:, 0]
    active = (t < num_frames)[:, None]
    alpha = jnp.where(active, new_alpha, alpha)
    norm = jnp.where(active[:, 0], new_norm, norm)
    return alpha, norm


def _logz_fwd_block(obs, g: BlockSparseGraph, num_frames):
    b, t_len = obs.shape[0], obs.shape[1]
    lin = _lincarry()
    defer = lin and _defernorm()
    alpha0 = _alpha_init_b(g, b, obs)
    if lin:
        alpha0 = jnp.exp(jnp.maximum(alpha0, NEG_INF))
    norm0 = jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]
    carry0 = ((alpha0, norm0, jnp.ones((b, 1), jnp.float32)) if defer
              else (alpha0, norm0))
    frame = (_fwd_frame_lin_defer if defer
             else _fwd_frame_lin if lin else _fwd_frame)

    def frame_xs(o):
        """Per-frame scan inputs in [T, ...] orientation for either mode."""
        if lin:
            eobs, om = _exp_obs_b(o)
            return (jnp.swapaxes(eobs, 0, 1), jnp.swapaxes(om, 0, 1))
        return (jnp.swapaxes(o, 0, 1),)

    if _full_save(g, b, t_len):
        # save EVERY post-frame state (LOG form); the backward skips
        # recompute
        def inner(carry, inp):
            new = frame(g, num_frames, carry, inp)
            save = (_defer_saved(new) if defer
                    else (_log_safe_b(new[0]), new[1]) if lin else new)
            return new, save

        end, (alphas, norms) = jax.lax.scan(
            inner, carry0,
            frame_xs(obs) + (jnp.arange(t_len),),
            unroll=_scan_unroll())
        saved = (alphas, norms)
    else:
        parts, ts, _ = _segmented_xs(obs, g, lin=lin)

        def inner(carry, inp):
            return frame(g, num_frames, carry, inp), None

        def outer(carry, inp):
            new_carry, _ = jax.lax.scan(inner, carry, inp,
                                        unroll=_scan_unroll())
            # save each segment's ENTRY state — normalized back to the
            # 2-tuple form under defer (one [B, Sp] divide per SEGMENT,
            # amortized over seg_len frames)
            save = (carry[0] / carry[2], carry[1]) if defer else carry
            return new_carry, save

        end, saved = jax.lax.scan(outer, carry0, parts + (ts,))
    if defer:
        alpha_T, norm_T, m_T = end
        alpha_T_log = _log_safe_b(alpha_T) - jnp.log(m_T)
    else:
        alpha_T, norm_T = end
        alpha_T_log = _log_safe_b(alpha_T) if lin else alpha_T
    total = jnp.maximum(alpha_T_log + g.final[None, :], NEG_INF)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return logz, saved


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fsa_logz_block(obs: jax.Array, graph: BlockSparseGraph,
                   num_frames: jax.Array) -> jax.Array:
    """log partition per batch element: [B] (block-sparse recursion)."""
    return _logz_fwd_block(obs, graph, num_frames)[0]


def _fsa_logz_b_fwd(obs, graph, num_frames):
    logz, (seg_alphas, seg_norms) = _logz_fwd_block(obs, graph, num_frames)
    return logz, (obs, num_frames, logz, seg_alphas, seg_norms)


def _fsa_logz_b_bwd(graph, res, ct):
    obs, num_frames, logz, seg_alphas, seg_norms = res
    gamma = _occupancies_block(obs, graph, num_frames, logz, seg_alphas,
                               seg_norms)
    return (ct[:, None, None] * gamma, None)


def _recompute_segment(g: BlockSparseGraph, num_frames, alpha_in, norm_in,
                       parts_seg, ts_seg, lin: bool):
    """Re-run one segment's alpha recursion, saving every frame's POST-frame
    (alpha [LOG form], norm) — the [C, B, Sp] transient the remat trades
    FLOPs for."""
    defer = lin and _defernorm()
    frame = (_fwd_frame_lin_defer if defer
             else _fwd_frame_lin if lin else _fwd_frame)
    carry0 = ((alpha_in, norm_in,
               jnp.ones((alpha_in.shape[0], 1), jnp.float32)) if defer
              else (alpha_in, norm_in))

    def inner(carry, inp):
        new = frame(g, num_frames, carry, inp)
        save = (_defer_saved(new) if defer
                else (_log_safe_b(new[0]), new[1]) if lin else new)
        return new, save

    _, (alphas, norms) = jax.lax.scan(inner, carry0,
                                      parts_seg + (ts_seg,),
                                      unroll=_scan_unroll())
    return alphas, norms


def _occupancies_block(obs, g: BlockSparseGraph, num_frames, logz,
                       seg_alphas, seg_norms):
    """gamma [B, T, P]: run beta backwards over saved post-frame alphas
    (full-save mode) or recompute alphas per segment (sqrt(T) remat)."""
    b, t_len, p_dim = obs.shape
    lin = _lincarry()
    tie = 0.0 * (jnp.reshape(seg_norms, (-1,))[0]
                 + jnp.reshape(seg_alphas, (-1,))[0])
    if lin:
        bm0 = jnp.max(g.final)
        bm0 = jnp.where(bm0 > 0.5 * NEG_INF, bm0, 0.0)
        beta0 = (jnp.broadcast_to(jnp.exp(jnp.maximum(g.final - bm0,
                                                      NEG_INF))[None, :],
                                  (b, g.num_padded)) + tie)
        bnorm0 = jnp.full((b,), bm0, jnp.float32) + tie
    else:
        beta0 = (jnp.broadcast_to(g.final[None, :], (b, g.num_padded))
                 + tie)
        bnorm0 = jnp.zeros((b,), jnp.float32) + tie

    def bwd_frame(carry, inp):
        beta, bnorm = carry
        obs_f, alpha_t, anorm_t, t = inp
        obs_s = obs_f[:, g.state_pdf]
        log_gamma = (alpha_t + anorm_t[:, None] + beta + bnorm[:, None]
                     - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        y = obs_s + beta
        m = jnp.maximum(jnp.max(y, axis=1, keepdims=True), NEG_INF)
        new_beta = _log_matvec_b(y - m, g, transpose=True) + m
        m2 = jnp.maximum(jnp.max(new_beta, axis=1, keepdims=True), NEG_INF)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        beta = jnp.where(active, new_beta_n, beta)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bnorm), gamma_s

    def bwd_frame_lin(carry, inp):
        bh, bnorm = carry                       # beta LINEAR, normalized
        eobs_f, om_f, alpha_t, anorm_t, t = inp
        log_gamma = (alpha_t + anorm_t[:, None] + _log_safe_b(bh)
                     + bnorm[:, None] - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        s = _block_matvec(bh * eobs_f[:, g.state_pdf], g, transpose=True)
        m2 = jnp.max(s, axis=1, keepdims=True)
        m2s = jnp.where(m2 > 0.0, m2, 1.0)
        new_bh = s / m2s
        new_bnorm = bnorm + om_f + jnp.log(m2s[:, 0])
        bh = jnp.where(active, new_bh, bh)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (bh, bnorm), gamma_s

    def bwd_frame_lin_defer(carry, inp):
        """Deferred-normalization beta frame (see _defernorm): carry
        (s unnormalized, bnorm incl. log m, m [B,1])."""
        bh, bnorm, m_prev = carry
        eobs_f, om_f, alpha_t, anorm_t, t = inp
        log_gamma = (alpha_t + anorm_t[:, None]
                     + (_log_safe_b(bh) - jnp.log(m_prev))
                     + bnorm[:, None] - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        eobs_row = eobs_f / m_prev                       # [B, P]
        s = _block_matvec(bh * eobs_row[:, g.state_pdf], g, transpose=True)
        m2 = jnp.max(s, axis=1, keepdims=True)
        m2s = jnp.where(m2 > 0.0, m2, 1.0)
        new_bnorm = bnorm + om_f + jnp.log(m2s[:, 0])
        bh = jnp.where(active, s, bh)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        m_prev = jnp.where(active, m2s, m_prev)
        return (bh, bnorm, m_prev), gamma_s

    defer = lin and _defernorm()
    bwd = bwd_frame_lin_defer if defer else bwd_frame_lin if lin else bwd_frame

    def scatter_pdf(gammas_s):
        """[C, B, Sp] state occupancies -> [C, B, P] pdf occupancies,
        outside the frame scans (parallel in C)."""
        c = gammas_s.shape[0]
        return jax.vmap(lambda row: jax.ops.segment_sum(
            row, g.state_pdf, num_segments=p_dim))(
                gammas_s.reshape(c * b, g.num_padded)).reshape(c, b, p_dim)

    bcarry0 = ((beta0, bnorm0, jnp.ones((b, 1), jnp.float32) + tie)
               if defer else (beta0, bnorm0))
    if _full_save(g, b, t_len):
        # seg_alphas/seg_norms hold EVERY post-frame state: one backward
        # pass, no recompute
        if lin:
            eobs, om = _exp_obs_b(obs)
            xs_f = (jnp.swapaxes(eobs, 0, 1), jnp.swapaxes(om, 0, 1))
        else:
            xs_f = (jnp.swapaxes(obs, 0, 1),)
        _, gammas_s = jax.lax.scan(
            bwd, bcarry0,
            xs_f + (seg_alphas, seg_norms, jnp.arange(t_len)),
            reverse=True, unroll=_scan_unroll())
        return jnp.swapaxes(scatter_pdf(gammas_s), 0, 1)

    parts, ts, n_seg = _segmented_xs(obs, g, lin=lin)
    n_parts = len(parts)

    def outer(carry, inp):
        parts_seg = inp[:n_parts]
        ts_seg, alpha_in, norm_in = inp[n_parts:]
        alphas, norms = _recompute_segment(g, num_frames, alpha_in, norm_in,
                                           parts_seg, ts_seg, lin)
        carry, gammas_s = jax.lax.scan(
            bwd, carry, parts_seg + (alphas, norms, ts_seg),
            reverse=True, unroll=_scan_unroll())
        return carry, scatter_pdf(gammas_s)

    _, gammas = jax.lax.scan(outer, bcarry0,
                             parts + (ts, seg_alphas, seg_norms),
                             reverse=True)
    gam = gammas.reshape(n_seg * g.seg_len, b, p_dim)[:t_len]
    return jnp.swapaxes(gam, 0, 1)


fsa_logz_block.defvjp(_fsa_logz_b_fwd, _fsa_logz_b_bwd)


def fsa_occupancies_block(obs, graph: BlockSparseGraph, num_frames):
    logz, (seg_alphas, seg_norms) = _logz_fwd_block(obs, graph, num_frames)
    gamma = _occupancies_block(obs, graph, num_frames, logz, seg_alphas,
                               seg_norms)
    return logz, gamma


# ---------------------------------------------------------------------------
# Expected accuracy (sMBR / MPE) in block-sparse form — the fb_dense
# factorization (accuracy sits on the destination state) with block matvecs
# and the same segmented remat.
# ---------------------------------------------------------------------------


def _state_labels_b(g: BlockSparseGraph, level: str):
    if level == "pdf":
        return g.state_pdf
    if level == "phone":
        if g.state_phone is None:
            raise ValueError("graph has no phone labels; cannot do "
                             "phone-level accuracy")
        return g.state_phone
    raise ValueError(level)


def _smbr_fwd_frame(g, lab, level, silence, num_frames, carry, inp):
    alpha, aacc, norm = carry
    obs_f, ref_t, t = inp
    obs_s = obs_f[:, g.state_pdf]
    ea = jnp.exp(jnp.maximum(alpha, NEG_INF))
    # one fused matvec over [2B] rows: the matvec is linear in its rows, so
    # stacking (ea, ea*acc) along batch reads each tile ONCE for the
    # denom/numer pair — halves the dominant HBM traffic of this frame
    bsz = ea.shape[0]
    dn = _block_matvec(jnp.concatenate([ea, ea * aacc], axis=0), g,
                       transpose=False)
    denom, numer = dn[:bsz], dn[bsz:]
    a_t = frame_accuracy(lab[None, :], ref_t[:, None], level, silence)
    new_alpha = (jnp.where(denom > 0,
                           jnp.log(jnp.where(denom > 0, denom, 1.0)), NEG_INF)
                 + obs_s)
    new_acc = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0),
                        0.0) + a_t
    m2 = jnp.maximum(jnp.max(new_alpha, axis=1, keepdims=True), NEG_INF)
    new_alpha = new_alpha - m2
    new_norm = norm + m2[:, 0]
    active = (t < num_frames)[:, None]
    alpha = jnp.where(active, new_alpha, alpha)
    aacc = jnp.where(active, new_acc, aacc)
    norm = jnp.where(active[:, 0], new_norm, norm)
    return alpha, aacc, norm


def _smbr_fwd_frame_lin(g, lab, level, silence, num_frames, carry, inp):
    """Linear-carry expected-accuracy frame (see _fwd_frame_lin): the obs
    factor cancels in the numer/denom acc ratio, so only the alpha side
    multiplies by exp(obs)."""
    ah, ac, norm = carry
    eobs_f, om_f, ref_t, t = inp
    bsz = ah.shape[0]
    dn = _block_matvec(jnp.concatenate([ah, ah * ac], axis=0), g, False)
    denom, numer = dn[:bsz], dn[bsz:]
    a_t = frame_accuracy(lab[None, :], ref_t[:, None], level, silence)
    u = denom * eobs_f[:, g.state_pdf]
    new_ac = jnp.where(denom > 0, numer / jnp.where(denom > 0, denom, 1.0),
                       0.0) + a_t
    m2 = jnp.max(u, axis=1, keepdims=True)
    m2s = jnp.where(m2 > 0.0, m2, 1.0)
    new_ah = u / m2s
    new_norm = norm + om_f + jnp.log(m2s[:, 0])
    active = (t < num_frames)[:, None]
    ah = jnp.where(active, new_ah, ah)
    ac = jnp.where(active, new_ac, ac)
    norm = jnp.where(active[:, 0], new_norm, norm)
    return ah, ac, norm


def _smbr_refs_seg(ref, g, t_len):
    """[B, T] refs → [n_seg, C, B] padded to the segment grid."""
    c = g.seg_len
    n_seg = -(-t_len // c)
    ref_t = jnp.swapaxes(ref, 0, 1)
    tp = n_seg * c
    if tp > ref_t.shape[0]:
        ref_t = jnp.pad(ref_t, [(0, tp - ref_t.shape[0]), (0, 0)],
                        constant_values=-1)
    return ref_t.reshape(n_seg, c, ref.shape[0])


def _smbr_fwd_block(obs, g: BlockSparseGraph, ref, num_frames, level,
                    silence=None):
    b, t_len = obs.shape[0], obs.shape[1]
    lin = _lincarry()
    lab = _state_labels_b(g, level)
    alpha0 = _alpha_init_b(g, b, obs)
    if lin:
        alpha0 = jnp.exp(jnp.maximum(alpha0, NEG_INF))
    acc0 = jnp.zeros((b, g.num_padded), jnp.float32) + 0.0 * alpha0
    norm0 = jnp.zeros((b,), jnp.float32) + 0.0 * alpha0[:, 0]
    frame = _smbr_fwd_frame_lin if lin else _smbr_fwd_frame

    def save_of(new):
        return (_log_safe_b(new[0]), new[1], new[2]) if lin else new

    if _full_save_smbr(g, b, t_len):
        def inner(carry, inp):
            new = frame(g, lab, level, silence, num_frames, carry, inp)
            return new, save_of(new)

        if lin:
            eobs, om = _exp_obs_b(obs)
            xs_f = (jnp.swapaxes(eobs, 0, 1), jnp.swapaxes(om, 0, 1))
        else:
            xs_f = (jnp.swapaxes(obs, 0, 1),)
        (alpha_T, acc_T, norm_T), segs = jax.lax.scan(
            inner, (alpha0, acc0, norm0),
            xs_f + (jnp.swapaxes(ref, 0, 1), jnp.arange(t_len)),
            unroll=_scan_unroll())
    else:
        parts, ts, n_seg = _segmented_xs(obs, g, lin=lin)
        refs = _smbr_refs_seg(ref, g, t_len)

        def inner(carry, inp):
            return frame(g, lab, level, silence, num_frames, carry, inp), None

        def outer(carry, inp):
            new_carry, _ = jax.lax.scan(inner, carry, inp,
                                        unroll=_scan_unroll())
            return new_carry, carry

        (alpha_T, acc_T, norm_T), segs = jax.lax.scan(
            outer, (alpha0, acc0, norm0), parts + (refs, ts))
    alpha_T_log = _log_safe_b(alpha_T) if lin else alpha_T
    total = jnp.maximum(alpha_T_log + g.final[None, :], NEG_INF)
    w = jax.nn.softmax(total, axis=1)
    f = jnp.sum(w * acc_T, axis=1)
    logz = jax.nn.logsumexp(total, axis=1) + norm_T
    return f, segs + (logz, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def fsa_expected_accuracy_block(obs, graph: BlockSparseGraph, ref, num_frames,
                                level: str = "pdf",
                                silence: Optional[SilenceOpts] = None):
    """E[#correct frames] under the graph posterior: [B] (block form).

    ``silence`` applies Kaldi's MpeVariants silence-phone rules."""
    f, _ = _smbr_fwd_block(obs, graph, ref, num_frames, level, silence)
    return f


def _smbr_b_fwd(obs, graph, ref, num_frames, level, silence):
    f, res = _smbr_fwd_block(obs, graph, ref, num_frames, level, silence)
    return f, (obs, ref, num_frames) + res


def _smbr_b_bwd(graph, level, silence, res, ct):
    g = graph
    (obs, ref, num_frames, seg_alphas, seg_aaccs, seg_norms, logz, f) = res
    b, t_len, p_dim = obs.shape
    lin = _lincarry()
    lab = _state_labels_b(g, level)
    if lin:
        bm0 = jnp.max(g.final)
        bm0 = jnp.where(bm0 > 0.5 * NEG_INF, bm0, 0.0)
        beta0 = (jnp.broadcast_to(
            jnp.exp(jnp.maximum(g.final - bm0, NEG_INF))[None, :],
            (b, g.num_padded)) + 0.0 * seg_alphas[0])
        bnorm0 = jnp.full((b,), bm0, jnp.float32) + 0.0 * seg_norms[0]
    else:
        beta0 = (jnp.broadcast_to(g.final[None, :], (b, g.num_padded))
                 + 0.0 * seg_alphas[0])
        bnorm0 = jnp.zeros((b,), jnp.float32) + 0.0 * seg_norms[0]
    bacc0 = jnp.zeros((b, g.num_padded), jnp.float32) + 0.0 * seg_alphas[0]

    def bwd_frame(carry, inp):
        beta, bacc, bnorm = carry
        obs_f, ref_f, alpha_t, aacc_t, anorm_t, t = inp
        obs_s = obs_f[:, g.state_pdf]
        log_gamma = (alpha_t + anorm_t[:, None] + beta + bnorm[:, None]
                     - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        contrib = gamma_s * (aacc_t + bacc - f[:, None])
        a_t = frame_accuracy(lab[None, :], ref_f[:, None], level, silence)
        y_log = obs_s + beta
        m = jnp.maximum(jnp.max(y_log, axis=1, keepdims=True), NEG_INF)
        y = jnp.exp(y_log - m)
        bsz = y.shape[0]
        dn = _block_matvec(jnp.concatenate([y, y * (a_t + bacc)], axis=0),
                           g, transpose=True)
        denom, numer = dn[:bsz], dn[bsz:]
        new_beta = (jnp.where(denom > 0,
                              jnp.log(jnp.where(denom > 0, denom, 1.0)),
                              NEG_INF) + m)
        new_bacc = jnp.where(denom > 0,
                             numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.maximum(jnp.max(new_beta, axis=1, keepdims=True), NEG_INF)
        new_beta_n = new_beta - m2
        new_bnorm = bnorm + m2[:, 0]
        beta = jnp.where(active, new_beta_n, beta)
        bacc = jnp.where(active, new_bacc, bacc)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (beta, bacc, bnorm), contrib

    def bwd_frame_lin(carry, inp):
        bh, bacc, bnorm = carry                   # beta LINEAR, normalized
        eobs_f, om_f, ref_f, alpha_t, aacc_t, anorm_t, t = inp
        log_gamma = (alpha_t + anorm_t[:, None] + _log_safe_b(bh)
                     + bnorm[:, None] - logz[:, None])
        gamma_s = jnp.exp(jnp.minimum(log_gamma, 0.0))
        active = (t < num_frames)[:, None]
        gamma_s = jnp.where(active, gamma_s, 0.0)
        contrib = gamma_s * (aacc_t + bacc - f[:, None])
        a_t = frame_accuracy(lab[None, :], ref_f[:, None], level, silence)
        y = bh * eobs_f[:, g.state_pdf]
        bsz = y.shape[0]
        dn = _block_matvec(jnp.concatenate([y, y * (a_t + bacc)], axis=0),
                           g, transpose=True)
        denom, numer = dn[:bsz], dn[bsz:]
        new_bacc = jnp.where(denom > 0,
                             numer / jnp.where(denom > 0, denom, 1.0), 0.0)
        m2 = jnp.max(denom, axis=1, keepdims=True)
        m2s = jnp.where(m2 > 0.0, m2, 1.0)
        new_bh = denom / m2s
        new_bnorm = bnorm + om_f + jnp.log(m2s[:, 0])
        bh = jnp.where(active, new_bh, bh)
        bacc = jnp.where(active, new_bacc, bacc)
        bnorm = jnp.where(active[:, 0], new_bnorm, bnorm)
        return (bh, bacc, bnorm), contrib

    def scatter_pdf(contribs):
        cc = contribs.shape[0]
        return jax.vmap(lambda row: jax.ops.segment_sum(
            row, g.state_pdf, num_segments=p_dim))(
                contribs.reshape(cc * b, g.num_padded)).reshape(cc, b, p_dim)

    bwd = bwd_frame_lin if lin else bwd_frame
    fwd_frame_s = _smbr_fwd_frame_lin if lin else _smbr_fwd_frame

    if _full_save_smbr(g, b, t_len):
        # every post-frame (alpha [log], acc, norm) was saved: one backward
        # pass
        if lin:
            eobs, om = _exp_obs_b(obs)
            xs_f = (jnp.swapaxes(eobs, 0, 1), jnp.swapaxes(om, 0, 1))
        else:
            xs_f = (jnp.swapaxes(obs, 0, 1),)
        _, contribs = jax.lax.scan(
            bwd, (beta0, bacc0, bnorm0),
            xs_f + (jnp.swapaxes(ref, 0, 1),
                    seg_alphas, seg_aaccs, seg_norms, jnp.arange(t_len)),
            reverse=True, unroll=_scan_unroll())
        grad = scatter_pdf(contribs)
        return (ct[:, None, None] * jnp.swapaxes(grad, 0, 1), None, None)

    parts, ts, n_seg = _segmented_xs(obs, g, lin=lin)
    n_parts = len(parts)
    c = g.seg_len
    refs = _smbr_refs_seg(ref, g, t_len)

    def recompute(alpha_in, acc_in, norm_in, parts_seg, refs_seg, ts_seg):
        def inner(carry, inp):
            new = fwd_frame_s(g, lab, level, silence, num_frames,
                              carry, inp)
            return new, ((_log_safe_b(new[0]), new[1], new[2]) if lin
                         else new)

        _, saved = jax.lax.scan(inner, (alpha_in, acc_in, norm_in),
                                parts_seg + (refs_seg, ts_seg),
                                unroll=_scan_unroll())
        return saved

    def outer(carry, inp):
        beta, bacc, bnorm = carry
        parts_seg = inp[:n_parts]
        refs_seg, ts_seg, alpha_in, acc_in, norm_in = inp[n_parts:]
        alphas, aaccs, norms = recompute(alpha_in, acc_in, norm_in,
                                         parts_seg, refs_seg, ts_seg)
        (beta, bacc, bnorm), contribs = jax.lax.scan(
            bwd, (beta, bacc, bnorm),
            parts_seg + (refs_seg, alphas, aaccs, norms, ts_seg),
            reverse=True, unroll=_scan_unroll())
        return (beta, bacc, bnorm), scatter_pdf(contribs)

    _, grads = jax.lax.scan(
        outer, (beta0, bacc0, bnorm0),
        parts + (refs, ts, seg_alphas, seg_aaccs, seg_norms), reverse=True)
    grad = grads.reshape(n_seg * c, b, p_dim)[:t_len]
    return (ct[:, None, None] * jnp.swapaxes(grad, 0, 1), None, None)


fsa_expected_accuracy_block.defvjp(_smbr_b_fwd, _smbr_b_bwd)
