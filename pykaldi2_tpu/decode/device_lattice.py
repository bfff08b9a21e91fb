"""On-device batched beam-search lattice generation.

Completes the TPU-first redesign of the reference's signature feature
(pykaldi2's on-the-fly denominator lattices, SURVEY.md §4.2 / §8 hard-part 2,
VERDICT r2 item 1): where the reference ships [B, T, P] posteriors to the CPU
and runs Kaldi's LatticeFasterDecoder per utterance, this module runs the
beam-pruned search for the WHOLE batch on the TPU and emits the banded
``ops/fb_lattice.TimeSyncLattice`` directly in HBM — no device→host copy, no
host decode, and same-step parameters (the host pipeline had to use
one-step-stale ones to overlap).

The TPU-idiomatic shape of "beam search": on a CPU, beams exist to SKIP work
(tokens never materialize). On a TPU the per-frame work must be regular, and
— the hard-won, measured-on-chip parts —
  (a) no big scatters: a first cut that stream-compacted kept links with
      cumsum+scatter spent ~60 ms/frame in serialized scatter updates;
  (b) no DYNAMIC-index gathers on the hot shapes: gathers whose indices
      come from data (the top-K frontier) run ~50x slower than gathers
      with COMPILE-TIME-CONSTANT indices (which XLA lowers to static DMA
      patterns) — a [B,275k] dynamic gather cost ~0.5 ms while the
      [B,7M] constant gather in the alpha recursion is essentially free.
Hence everything per frame is dense over [B, S(, D)] with constant-index
gathers, and compaction is exact lax.top_k (cheap: ~0.25 ms at n=222k):

  pack time:   arcs are laid out CSR by DESTINATION state, states split
               into an in-degree-2-ish bucket (HMM interiors) and a
               max-in-degree bucket (junction entries) each padded to its
               own width (the dual of cuDNN-style padding: bounded
               irregularity becomes a dense axis; bucketing keeps the
               dense axis ~3x leaner than one [S, D_max] table).
               Emissions sit on the destination state (dst-emission
               invariant), so per-arc pdfs are state pdfs.
  per frame t (one ``lax.scan`` step, all static shapes):
    relax[b,s,d] = alpha[b, in_src[s,d]] + in_w[s,d]        (constant idx)
    newalpha     = max_d relax + obs_t[:, state_pdf]
    frontier     = top-K states within `beam` of the best (K = max_active)
    links        = ALL S·D arc scores relax + obs, kept within
                   `lattice_beam` of the dst state's best with both
                   endpoints on emitted slots (slot maps: two tiny [B, K]
                   scatters); band = top-A of the S·D scores by ONE exact
                   top_k — overflow drops the WORST links, counted

Emitting arcs must satisfy the destination-emission invariant — what
``graph/compile.expand_to_pdf_fst`` / ``make_decode_graph`` emit (their
junctions are collapsed). Input-epsilon arcs are handled two ways
(``pack_decode_graph(eps_mode=...)``):

  fold     offline ``remove_input_epsilons`` (the SE den-graph default) —
           exact, but backoff word-LM graphs blow up: every emitting arc
           duplicates once per eps predecessor (measured 6.1M folded arcs
           from ~100k, junction in-degree ~7000, at 600-word trigram scale)
  inframe  keep eps arcs; the search runs L in-frame eps-relaxation rounds
           per frame (host decoder's ProcessNonemitting, L = longest eps
           chain) over compact z-lists, and the LINK band folds eps chains
           at emission time — only beam-surviving combinations materialize.
           Same 600-word graph: pack 80 s → 0.3 s, relax lanes 6.1M → 168k,
           band width 7053 → 3.  Pre-frame-0 eps chains fold via the packed
           ``eps0_w`` start closure; eps-reached final states become real
           last-frame lattice nodes (finals stay raw).

Word-HCLG EVAL decoding rides the same search (``bin/decode -decoder
device``, eps_mode="auto"): word olabels ride the band sort as one extra
payload operand (``return_olabels=True``) and ``banded_to_fsas`` converts
the banded lattices to the host decoder's ``(DenseFsa, frames)`` contract,
so N-best / oracle / MBR-consensus / LM-scale sweeps consume device
lattices unchanged (parity tests: same hypotheses/scores as
native/latdec.cc at the same beams; fold ≡ inframe on FB quantities except
when an eps-chain crosses FINAL states — offline folding Viterbi-collapses
those endings while inframe keeps each as a distinct lattice node, matching
the host). Million-state graphs stay on the host C++ decoder (the [B, S]
dense alpha is the scale bound).
"""

from __future__ import annotations

import functools
import os
import subprocess
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.graph.fst import EPS, Fst
from pykaldi2_tpu.ops.fb import NEG_INF
from pykaldi2_tpu.ops.fb_lattice import TimeSyncLattice


class DeviceDecodeGraph(NamedTuple):
    """Destination-CSR arc tables + per-state emissions for the search,
    split into two IN-DEGREE BUCKETS: HMM-interior states have 1-2 in-arcs
    (self-loop + advance) while junction-entry states collect one arc per
    predecessor phone/word, so padding every state to the max in-degree
    wastes ~3x the gather/elementwise bytes of every search frame (the
    bench den HCLG: 79k arcs over 222k [S, D] slots vs 35k bucketed —
    measured 6.4x fewer relaxation bytes). States are REORDERED so the
    low-degree bucket is the contiguous prefix [0, s_lo).

    ``start``/``num_states``/``s_lo``/``d_lo``/``d_hi`` are static
    metadata (they shape the compiled program); the pytree registration
    below keeps them out of the traced leaves — one compilation per graph
    topology, as with bucketed shapes.
    """

    in_src_lo: jax.Array   # [S1, d_lo] int32 in-arc source state (pad 0)
    in_w_lo: jax.Array     # [S1, d_lo] f32 graph score (pad NEG_INF)
    in_src_hi: jax.Array   # [S2, d_hi] high-degree bucket (S2 may be 0)
    in_w_hi: jax.Array     # [S2, d_hi]
    in_ol_lo: jax.Array    # [S1, d_lo] int32 arc word olabel (0 = eps/pad)
    in_ol_hi: jax.Array    # [S2, d_hi]
    state_pdf: jax.Array   # [S] int32 pdf emitted by arcs INTO the state
    final: jax.Array       # [S] f32 log-prob, NEG_INF where non-final
    # ---- in-frame epsilon tables (eps_mode="inframe"; all empty under
    # "fold"). Alpha side: dst-CSR over the COMPACT lists of states with
    # eps in-arcs (two degree buckets), applied as constant-index
    # scatter-max rounds. Band side: src-CSR out-arc tables over ALL
    # states (eps out-degree is tiny — one backoff arc per LM state). ----
    eps_z1: jax.Array      # [Z1] int32 states, smallest eps in-degree bucket
    eps_src_z1: jax.Array  # [Z1, e1] int32 eps in-arc sources (pad 0)
    eps_w_z1: jax.Array    # [Z1, e1] f32 (pad NEG_INF)
    eps_z2: jax.Array      # [Z2] mid-degree bucket
    eps_src_z2: jax.Array  # [Z2, e2]
    eps_w_z2: jax.Array    # [Z2, e2]
    eps_z3: jax.Array      # [Z3] largest-degree bucket (backoff hubs)
    eps_src_z3: jax.Array  # [Z3, e3]
    eps_w_z3: jax.Array    # [Z3, e3]
    eps_out_dst: jax.Array  # [S, D_out] int32 eps out-arc dests (pad 0)
    eps_out_w: jax.Array    # [S, D_out] f32 (pad NEG_INF)
    eps0_w: jax.Array       # [S] f32 best eps-chain weight start→s
    start: int
    num_states: int
    s_lo: int              # S1: states [0, s_lo) use the lo tables
    d_lo: int
    d_hi: int
    num_pdfs: int          # 1 + max(state_pdf): sizes the sort payload
    has_olabels: bool      # static: any nonzero word olabel (eval graphs)
    eps_depth: int         # L: longest eps chain (0 = no in-frame eps)
    # static per-layer row offsets into the (depth, id)-sorted z tables:
    # layer r (1-indexed) rows = [offs[r-1], offs[r]) — the closure touches
    # each eps dst once, in topo order (len = eps_depth + 1; () when 0)
    eps_layers_z1: tuple = ()
    eps_layers_z2: tuple = ()
    eps_layers_z3: tuple = ()


jax.tree_util.register_pytree_node(
    DeviceDecodeGraph,
    lambda g: ((g.in_src_lo, g.in_w_lo, g.in_src_hi, g.in_w_hi,
                g.in_ol_lo, g.in_ol_hi, g.state_pdf, g.final,
                g.eps_z1, g.eps_src_z1, g.eps_w_z1,
                g.eps_z2, g.eps_src_z2, g.eps_w_z2,
                g.eps_z3, g.eps_src_z3, g.eps_w_z3,
                g.eps_out_dst, g.eps_out_w, g.eps0_w),
               (g.start, g.num_states, g.s_lo, g.d_lo, g.d_hi, g.num_pdfs,
                g.has_olabels, g.eps_depth, g.eps_layers_z1,
                g.eps_layers_z2, g.eps_layers_z3)),
    lambda aux, leaves: DeviceDecodeGraph(*leaves, *aux))


def _mask8() -> bool:
    """Opt-in int8 emit-mask link candidates (see the step body comment)."""
    import os

    env = os.environ.get("PK2_DEV_SEARCH_MASK8")
    if env not in (None, "", "0", "1"):
        raise ValueError(f"PK2_DEV_SEARCH_MASK8={env!r}: expected 0 or 1")
    return env == "1"


_SEG = 128  # one TPU lane row per segment


def _seg_topk_mode() -> str:
    """PK2_DEV_TOPK=seg|sort|auto — frontier top-K formulation.

    ``sort``: plain ``lax.top_k`` over [B, S] (lowers to multi-stage
    bitonic sorts, ~linear in S — ~20 ms/frame at S=204k on v5e).
    ``seg``: the segment-bound form below. ``auto`` (default): ``seg``
    once S is large enough that the S-domain sort loses (eval-scale word
    HCLGs); the small den graphs of the SE path keep the plain top_k.
    """
    import os

    env = os.environ.get("PK2_DEV_TOPK", "auto")
    if env not in ("seg", "sort", "auto"):
        raise ValueError(f"PK2_DEV_TOPK={env!r}: expected seg|sort|auto")
    return env


def _frontier_top_k(new_alpha: jax.Array, k: int):
    """EXACT top-K over [B, S] without an S-domain sort.

    Segment-max bound: split the state axis into contiguous 128-lane
    segments. Any global top-K item's segment is among the top-K segments
    ranked by (segment max desc, segment idx asc) — if K segments beat it,
    each contains an element that outranks the item (strictly larger, or
    equal with a smaller global index, segments being contiguous index
    ranges). So: one [B, S] max-reduce, a top_k over S/128 maxima, a
    [B, K, 128] segment gather, then ONE S-independent two-key sort
    (-value, global index) over the K*128 candidates — which reproduces
    ``lax.top_k``'s output exactly, ties included (ties -> lowest state
    index), so lattices are bit-identical either way.

    Replaces the per-frame cost that dominates eval-scale decoding (the
    dev_eval S-sweep, BASELINE.md r4: search ~linear in S up to 204k
    states) with one streaming pass over [B, S] plus S-independent sorts.
    """
    b, s = new_alpha.shape
    nseg = -(-s // _SEG)
    pad = nseg * _SEG - s
    imin = jnp.int32(-(1 << 31))
    # monotone total-order int32 key: skey ascending == float total order
    # ascending, INCLUDING -0.0 < +0.0 — lax.top_k uses the total order, so
    # a plain float comparator would mis-rank ±0.0 ties (caught by
    # test_frontier_top_k_matches_lax_top_k). Int keys also make every
    # tie-break below bit-exact.
    bits = jax.lax.bitcast_convert_type(new_alpha, jnp.int32)
    skey = jnp.where(bits < 0, ~bits ^ imin, bits)
    if pad:  # pad with skey(NEG_INF) so padded lanes decode to NEG_INF
        neg_inf_key = int(~np.float32(NEG_INF).view(np.int32) ^ np.int32(
            -(1 << 31)))
        skey = jnp.pad(skey, [(0, 0), (0, pad)],
                       constant_values=neg_inf_key)
    seg = skey.reshape(b, nseg, _SEG)
    seg_best = jnp.max(seg, axis=2)                               # [B, nseg]
    kseg = min(k, nseg)
    _, seg_idx = jax.lax.top_k(seg_best, kseg)                    # [B, kseg]
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)  # [B,kseg,128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, kseg, _SEG), 2)
    gidx = seg_idx[:, :, None] * _SEG + lane                      # global idx
    nkey, idx = jax.lax.sort(
        (~cand.reshape(b, kseg * _SEG), gidx.reshape(b, kseg * _SEG)),
        dimension=1, num_keys=2)                # ~skey asc == value desc
    skey_top, idx = ~nkey[:, :k], idx[:, :k]
    vals = jax.lax.bitcast_convert_type(
        jnp.where(skey_top < 0, ~(skey_top ^ imin), skey_top), jnp.float32)
    # padded lanes are NEG_INF-ranked and can only be selected when fewer
    # than K finite states exist; keep their indices in-range for the
    # downstream state_pdf/final gathers (lax.top_k would return a real
    # index whose value is also dead — equivalent, both beam-masked; the
    # slot scatters use .max so a dead index colliding with a live one
    # cannot clobber its slot)
    return vals, jnp.minimum(idx, s - 1)


def _eps_dag_depth(S: int, esrc: np.ndarray, edst: np.ndarray):
    """(longest eps-chain length, per-state depth [S]) via Kahn topo order;
    None when cyclic. depth[s] = longest eps chain ENDING at s (0 = no eps
    in-arcs) — state s's closure value is final after layer depth[s]."""
    order = np.argsort(esrc, kind="stable")
    es, ed = esrc[order], edst[order]
    row_s = np.searchsorted(es, np.arange(S))
    row_e = np.searchsorted(es, np.arange(S) + 1)
    depth = np.zeros(S, np.int64)
    indeg = np.bincount(edst, minlength=S)
    stack = [int(s) for s in range(S) if indeg[s] == 0]
    seen = 0
    while stack:
        s = stack.pop()
        seen += 1
        for d in ed[row_s[s]:row_e[s]]:
            if depth[s] + 1 > depth[d]:
                depth[d] = depth[s] + 1
            indeg[d] -= 1
            if indeg[d] == 0:
                stack.append(int(d))
    if seen != S:
        return None
    return (int(depth.max()) if len(depth) else 0), depth


def _degree_split_tables(items_dst, items_cols, S, fill_vals,
                         n_buckets: int = 2):
    """Compact dst-CSR split into degree buckets.

    ``items_dst`` [E]: destination of each item; ``items_cols``: list of
    per-item column arrays to scatter. Returns a list of ``n_buckets``
    (z, tabs) pairs where z holds the distinct destinations of that degree
    bucket (ascending degree thresholds, possibly empty) and tabs are
    [len(z), width] tables in items order per destination. Bucket
    boundaries minimize total padded slots by brute force over the unique
    degrees (the eps z-tables of a 4-gram HCLG: 2 buckets pad 3.76M slots
    for 230k arcs, 3 buckets 0.94M)."""
    z, counts = np.unique(items_dst, return_counts=True)
    if not len(z):
        e = [np.zeros((0, 1), c.dtype if hasattr(c, "dtype") else np.int32)
             for c in items_cols]
        return [(np.zeros(0, np.int32), [x.copy() for x in e])
                for _ in range(n_buckets)]
    uniq_deg = np.unique(counts)
    counts_sorted = np.sort(counts)

    def slots_for(bounds):
        # #destinations with degree in (prev, t] times the bucket width t,
        # via searchsorted on the pre-sorted degree array: O(log N) per
        # bound instead of an O(N) mask pass (ADVICE r4: the mask form made
        # the brute force O(U^2 * N) — hours at U~2000 distinct degrees).
        total, prev = 0, 0
        for t in bounds:
            n = int(np.searchsorted(counts_sorted, t, side="right")
                    - np.searchsorted(counts_sorted, prev, side="right"))
            total += n * int(t)
            prev = t
        return total

    best, best_bounds = None, None
    import itertools
    top = int(counts.max())
    inner = [int(t) for t in uniq_deg if t < top]
    # Bound the O(U^{n_buckets-1}) combination sweep: past ~256 distinct
    # degrees, quantile-subsample the candidate boundary set. Boundaries
    # remain exact degrees (so every bucket is tight for its largest
    # member); only the search grid coarsens.
    if len(inner) > 256:
        idx = np.unique(np.linspace(0, len(inner) - 1, 256).astype(int))
        inner = [inner[i] for i in idx]
    for r in range(min(n_buckets - 1, len(inner)) + 1):
        for combo in itertools.combinations(inner, r):
            s = slots_for(list(combo) + [top])
            if best is None or s < best:
                best, best_bounds = s, list(combo) + [top]
    bounds = best_bounds + [top] * (n_buckets - len(best_bounds))

    order = np.argsort(items_dst, kind="stable")
    pos_of = {int(s): i for i, s in enumerate(z)}
    didx = np.asarray([pos_of[int(d)] for d in items_dst[order]])
    starts = np.cumsum(counts) - counts
    rank = np.arange(len(items_dst)) - starts[didx]

    def build(sel, width):
        zs = z[sel].astype(np.int32)
        row_of = np.full(len(z), -1, np.int64)
        row_of[np.nonzero(sel)[0]] = np.arange(int(sel.sum()))
        tabs = []
        m = sel[didx]
        for col, fill in zip(items_cols, fill_vals):
            tab = np.full((int(sel.sum()), max(width, 1)), fill,
                          np.asarray(col).dtype)
            tab[row_of[didx[m]], rank[m]] = np.asarray(col)[order][m]
            tabs.append(tab)
        return zs, tabs

    out, prev = [], 0
    for i, t in enumerate(bounds):
        sel = (counts > prev) & (counts <= t)
        out.append(build(sel, int(t) if sel.any() else 0))
        prev = t
    return out


def pack_decode_graph(fst: Fst, word_penalty: float = 0.0,
                      max_in_degree: int = 1024,
                      eps_mode: str = "fold",
                      max_eps_depth: int = 8,
                      max_eps_out: int = 16) -> DeviceDecodeGraph:
    """pdf-level decode FST (ilabel = pdf+1, olabel = word) → device tables.

    Input-epsilon arcs (word-LM backoff/junction arcs in HCLG-scale graphs)
    are handled per ``eps_mode``:

    - ``"fold"`` (default; the SE den-graph path): `remove_input_epsilons`
      folds the closure offline on the SOURCE side (s --eps*--> c --emit-->
      x  ⇒  s --emit--> x), which keeps the destination-emission invariant.
      Exact, but on backoff word-LM graphs the fold MULTIPLIES arcs (every
      emitting arc once per eps-predecessor — measured 6.1M folded arcs
      from ~100k at 600-word trigram scale, DESIGN.md §12).
    - ``"inframe"``: keep eps arcs and run L in-frame eps-relaxation rounds
      per frame inside the search (L = longest eps chain), exactly like the
      host decoder's ProcessNonemitting — lane work stays proportional to
      the RAW arc count. Requires an acyclic eps subgraph with depth ≤
      ``max_eps_depth``, eps out-degree ≤ ``max_eps_out``, and olabel-free
      eps arcs; end-of-path eps chains are folded into the finals offline.
    - ``"auto"``: "inframe" when the graph has eps arcs and meets the
      inframe requirements, else "fold".

    ``max_in_degree`` guards the [S, D] padding: a graph where one state
    collects thousands of in-arcs would make every frame pay D-wide gathers
    — that is host-decoder territory.
    """
    if eps_mode not in ("fold", "inframe", "auto"):
        raise ValueError(f"eps_mode={eps_mode!r}")

    def extract(f):
        src_, ilab_, olab_, w_, dst_ = [], [], [], [], []
        for s in range(f.num_states):
            for a in f.arcs[s]:
                src_.append(s)
                ilab_.append(a.ilabel)
                olab_.append(a.olabel)
                w_.append(a.weight)
                dst_.append(a.nextstate)
        return (np.asarray(src_, np.int64), np.asarray(ilab_, np.int64),
                np.asarray(olab_, np.int64),
                np.nan_to_num(np.asarray(w_, np.float32), neginf=NEG_INF,
                              posinf=NEG_INF),
                np.asarray(dst_, np.int64))

    start0 = int(fst.start)
    a_src, a_il, a_ol, a_w, a_dst = extract(fst)
    is_eps = a_il == EPS
    eps_depth = 0
    eps_arcs = (np.zeros(0, np.int64),) * 2 + (np.zeros(0, np.float32),)
    S = int(fst.num_states)
    final = np.full(S, NEG_INF, np.float32)
    for s, fw in fst.finals.items():
        final[s] = np.float32(np.nan_to_num(fw, neginf=NEG_INF,
                                            posinf=NEG_INF))
    if is_eps.any():
        esrc, edst, ew = a_src[is_eps], a_dst[is_eps], a_w[is_eps]
        dd = _eps_dag_depth(S, esrc, edst)
        depth, state_depth = dd if dd is not None else (None, None)
        out_deg = int(np.bincount(esrc, minlength=S).max())
        ok_inframe = (depth is not None and depth <= max_eps_depth
                      and out_deg <= max_eps_out
                      and not np.any(a_ol[is_eps]))
        mode = eps_mode if eps_mode != "auto" else (
            "inframe" if ok_inframe else "fold")
        if mode == "inframe":
            if not ok_inframe:
                raise ValueError(
                    "eps_mode='inframe' needs an acyclic, olabel-free eps "
                    f"subgraph with depth ≤ {max_eps_depth} and out-degree "
                    f"≤ {max_eps_out} (got depth {depth}, out-degree "
                    f"{out_deg}, olabeled "
                    f"{int(np.count_nonzero(a_ol[is_eps]))})")
            eps_depth = depth
            eps_arcs = (esrc, edst, ew)
            # finals stay RAW: the search's in-frame closure makes
            # eps-reached final states real last-frame lattice nodes with
            # their own finals — folding trailing chains here would count
            # the same ending twice (once via the folded final, once via
            # the explicit node)
            a_src, a_il, a_ol, a_w, a_dst = (
                x[~is_eps] for x in (a_src, a_il, a_ol, a_w, a_dst))
        else:
            # tropical fold: keeps exact Viterbi parity with the host
            # decoder (the documented fold-mode contract). Where parallel
            # eps routes between the same state pair exist, a tropical fold
            # keeps only the best route's mass in sum-semiring FB — use
            # eps_mode="inframe" (or "auto") there; the in-frame search
            # keeps parallel routes as separate band entries and matches
            # the full-graph logZ exactly (see tests/test_device_lattice
            # test_random_eps_dag_host_device_ground_truth).
            fst2 = fst.remove_input_epsilons()
            S = int(fst2.num_states)
            start0 = int(fst2.start)
            a_src, a_il, a_ol, a_w, a_dst = extract(fst2)
            final = np.full(S, NEG_INF, np.float32)
            for s, fw in fst2.finals.items():
                final[s] = np.float32(np.nan_to_num(fw, neginf=NEG_INF,
                                                    posinf=NEG_INF))
    if np.any(a_il == EPS):
        raise ValueError("decode FST still has epsilon input arcs")
    # destination-emission invariant over the EMIT arcs
    pdf_arc = (a_il - 1).astype(np.int64)
    state_pdf = np.zeros(S, np.int64)
    state_pdf[a_dst] = pdf_arc
    if np.any(state_pdf[a_dst] != pdf_arc):
        raise ValueError(
            "decode graph violates the destination-emission invariant "
            "(arcs into one state carry different pdfs); the device search "
            "needs compiler-emitted graphs (expand_to_pdf_fst)")
    src = a_src
    dst = a_dst
    w = a_w - np.where(a_ol != 0, np.float32(word_penalty), np.float32(0.0))
    counts = np.bincount(dst, minlength=S)
    d_max = int(counts.max()) if len(counts) else 1
    if d_max > max_in_degree:
        raise ValueError(
            f"graph max in-degree {d_max} exceeds {max_in_degree}; the "
            "[S, D] padded search would be dominated by dead lanes — use "
            "the host decoder for this graph")
    # in-degree bucket split: pick the low-bucket width minimizing total
    # padded slots S1(t)*t + (S - S1(t))*d_max (t = d_max ⇒ no split)
    uniq_deg = np.unique(np.maximum(counts, 1))
    slots = [(int((counts <= t).sum()) * int(t)
              + int((counts > t).sum()) * d_max, int(t)) for t in uniq_deg]
    _, d_lo = min(slots)
    is_lo = counts <= d_lo
    perm = np.argsort(~is_lo, kind="stable")    # lo states first, order kept
    inv = np.empty(S, np.int64)
    inv[perm] = np.arange(S)
    src, dst = inv[src], inv[dst]
    state_pdf = np.asarray(state_pdf)[perm]
    counts = counts[perm]
    s1 = int(is_lo.sum())
    d_hi = d_max if s1 < S else 0

    order = np.argsort(dst, kind="stable")
    starts = np.cumsum(counts) - counts
    rank = np.arange(len(dst)) - starts[dst[order]]
    in_src_lo = np.zeros((s1, d_lo), np.int32)
    in_w_lo = np.full((s1, d_lo), NEG_INF, np.float32)
    in_src_hi = np.zeros((S - s1, d_hi), np.int32)
    in_w_hi = np.full((S - s1, d_hi), NEG_INF, np.float32)
    ol = a_ol.astype(np.int32)
    in_ol_lo = np.zeros((s1, d_lo), np.int32)
    in_ol_hi = np.zeros((S - s1, d_hi), np.int32)
    ds, rk, ss, ws, ols = dst[order], rank, src[order], w[order], ol[order]
    lo_arc = ds < s1
    in_src_lo[ds[lo_arc], rk[lo_arc]] = ss[lo_arc]
    in_w_lo[ds[lo_arc], rk[lo_arc]] = ws[lo_arc]
    in_ol_lo[ds[lo_arc], rk[lo_arc]] = ols[lo_arc]
    if s1 < S:
        in_src_hi[ds[~lo_arc] - s1, rk[~lo_arc]] = ss[~lo_arc]
        in_w_hi[ds[~lo_arc] - s1, rk[~lo_arc]] = ws[~lo_arc]
        in_ol_hi[ds[~lo_arc] - s1, rk[~lo_arc]] = ols[~lo_arc]
    final = final[perm]

    # ---- in-frame eps tables (empty when eps_depth == 0) ----
    esrc, edst, ew = eps_arcs
    esrc = inv[esrc] if len(esrc) else esrc.astype(np.int64)
    edst = inv[edst] if len(edst) else edst.astype(np.int64)
    zbuckets = _degree_split_tables(
        edst, [esrc.astype(np.int32), ew.astype(np.float32)], S,
        [0, NEG_INF], n_buckets=3)
    # topo-LAYER the z-lists (host latdec.cc's topo-order closure, banded):
    # a state of eps-depth r is final after one update whose sources
    # (depth < r) are already closed, so the per-frame closure touches each
    # eps dst ONCE instead of L times — at 4-gram HCLG scale (eps_depth 4,
    # z-tables [114k, 20] + [292, 5020]) that is 4x fewer gather lanes per
    # frame. Rows are sorted by (depth, state id); the static row offsets
    # per layer ride the pytree aux. Three degree buckets: the same graph's
    # 2-bucket split pads 3.76M slots, the 3-bucket one 0.94M.
    zlay = [(), (), ()]
    if eps_depth:
        sd = state_depth[perm]                       # depth in NEW state ids

        def layer_sort(z, tabs):
            d = sd[z]
            o = np.argsort(d, kind="stable")
            offs = tuple(
                int(np.searchsorted(d[o], r, side="left"))
                for r in range(1, eps_depth + 1)) + (len(z),)
            return z[o], [t[o] for t in tabs], offs

        for i, (z, tabs) in enumerate(zbuckets):
            zb, tabs, zlay[i] = layer_sort(z, tabs)
            zbuckets[i] = (zb, tabs)
    (z1, (ez_src1, ez_w1)), (z2, (ez_src2, ez_w2)), \
        (z3, (ez_src3, ez_w3)) = zbuckets
    d_out = int(np.bincount(esrc, minlength=S).max()) if len(esrc) else 0
    eps_out_dst = np.zeros((S, max(d_out, 1) if d_out else 0), np.int32)
    eps_out_w = np.full((S, max(d_out, 1) if d_out else 0), NEG_INF,
                        np.float32)
    if d_out:
        o2 = np.argsort(esrc, kind="stable")
        oc = np.bincount(esrc, minlength=S)
        ost = np.cumsum(oc) - oc
        ork = np.arange(len(esrc)) - ost[esrc[o2]]
        eps_out_dst[esrc[o2], ork] = edst[o2].astype(np.int32)
        eps_out_w[esrc[o2], ork] = ew[o2].astype(np.float32)
    # best eps-chain weight start→s (closes the PRE-frame-0 eps moves:
    # frame-0 links from eps-reached initial states source slot 0 and carry
    # this weight folded in; best-path collapse — alternative initial eps
    # paths to the same state keep only the Viterbi one)
    eps0_w = np.full(S, NEG_INF, np.float32)
    eps0_w[int(inv[start0])] = 0.0
    for _ in range(eps_depth):
        cand = eps0_w[esrc] + ew.astype(np.float32)
        np.maximum.at(eps0_w, edst, cand)

    return DeviceDecodeGraph(
        in_src_lo=jnp.asarray(in_src_lo), in_w_lo=jnp.asarray(in_w_lo),
        in_src_hi=jnp.asarray(in_src_hi), in_w_hi=jnp.asarray(in_w_hi),
        in_ol_lo=jnp.asarray(in_ol_lo), in_ol_hi=jnp.asarray(in_ol_hi),
        state_pdf=jnp.asarray(state_pdf),
        final=jnp.asarray(final),
        eps_z1=jnp.asarray(z1), eps_src_z1=jnp.asarray(ez_src1),
        eps_w_z1=jnp.asarray(ez_w1),
        eps_z2=jnp.asarray(z2), eps_src_z2=jnp.asarray(ez_src2),
        eps_w_z2=jnp.asarray(ez_w2),
        eps_z3=jnp.asarray(z3), eps_src_z3=jnp.asarray(ez_src3),
        eps_w_z3=jnp.asarray(ez_w3),
        eps_out_dst=jnp.asarray(eps_out_dst),
        eps_out_w=jnp.asarray(eps_out_w),
        eps0_w=jnp.asarray(eps0_w),
        start=int(inv[start0]), num_states=S, s_lo=s1,
        d_lo=int(d_lo), d_hi=int(d_hi),
        num_pdfs=int(np.asarray(state_pdf).max()) + 1 if S else 1,
        has_olabels=bool(np.any(ol)), eps_depth=eps_depth,
        eps_layers_z1=zlay[0], eps_layers_z2=zlay[1], eps_layers_z3=zlay[2])


@functools.partial(jax.jit, static_argnames=("max_active", "max_arcs",
                                             "beam", "lattice_beam",
                                             "return_olabels"))
def device_lattice_generate(
    obs: jax.Array,
    graph: DeviceDecodeGraph,
    num_frames: jax.Array,
    *,
    max_active: int = 256,
    max_arcs: int = 1024,
    beam: float = 16.0,
    lattice_beam: float = 8.0,
    return_olabels: bool = False,
) -> Tuple:
    """Batched beam search → (TimeSyncLattice, best scores [B], dropped [B])
    — plus the link olabels [B, T, A] as a 4th element iff
    ``return_olabels=True``.

    ``return_olabels=True`` (word-HCLG eval decoding) additionally returns
    the per-link word olabels [B, T, A] (0 = eps) as a fourth element — the
    labels ride the band sort as one more payload operand, so the SE path
    (den graphs, no olabels) pays nothing for the feature.

    obs [B, T, P]: acoustic-scaled scores (same matrix the FB kernels will
    consume). Returns the banded lattice (slots = frontier positions,
    K = max_active, A = max_arcs per frame), the best end-to-end path
    log-score per utterance (final weights folded, host-decoder fallback
    when no final state survives), and the number of band entries dropped
    to the [B, A] cap (overflow drops the LOWEST-scoring entries; 0
    everywhere ⇒ the band was wide enough — otherwise widen ``max_arcs`` or
    tighten ``lattice_beam``). Under in-frame eps (eps_depth > 0) the band
    also holds search-beam expansion carriers, so a nonzero count is a
    CONSERVATIVE overflow signal: a dropped carrier may or may not have
    produced an emitted link.

    Differentiation: lattice STRUCTURE is data, not a differentiable
    quantity — call under ``stop_gradient``-ed obs (the SE loss re-folds obs
    through the lattice's pdf labels with its own VJP).
    """
    b, t_len, _p = obs.shape
    g = graph
    if return_olabels and not g.has_olabels:
        raise ValueError("return_olabels=True needs a graph packed with "
                         "word olabels (pack_decode_graph of an FST whose "
                         "arcs carry nonzero output labels)")
    S, S1 = g.num_states, g.s_lo
    S2, Dc = S - S1, g.d_lo + g.d_hi
    K = min(max_active, S)
    # upper bound on links per frame: K*Dc emit candidates, each eps round
    # multiplying by (1 + d_out) — only a CLAMP for max_arcs, the real band
    # stays max_arcs wide
    bound = K * Dc
    for _ in range(g.eps_depth):
        bound = min(bound * (1 + g.eps_out_dst.shape[1]), 1 << 30)
    A = min(max_arcs, bound)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]

    # ---- the search scan. Everything per frame is DENSE over the
    # degree-bucketed [B, S1, d_lo] / [B, S2, d_hi] arc tables with
    # CONSTANT-index gathers (the tables are compile-time constants — XLA
    # turns those into fast static DMA patterns, ~50x the throughput of
    # dynamic-index gathers), one exact top_k over S for the frontier, one
    # over K*Dc for the band, and two tiny [B, K] scatters. Dynamic-index
    # gathers are confined to [B, A]-sized lookups. ----
    # initial state = the start's PRE-frame eps closure (eps0_w degenerates
    # to {start: 0} when eps_depth == 0): eps-reached initial states carry
    # their chain weight in alpha and source frame-0 links from slot 0
    alpha0 = jnp.broadcast_to(g.eps0_w[None], (b, S))
    slot0 = jnp.broadcast_to(
        jnp.where(g.eps0_w > 0.5 * NEG_INF, 0, -1)[None], (b, S))
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (b, K), 1)
    # frontier top-K formulation: the segment-bound form beats the S-domain
    # lax.top_k sort once S dwarfs the K*128 candidate set (measured on
    # chip, see BASELINE.md r4 dev_eval rows); identical output either way
    topk_mode = _seg_topk_mode()
    use_seg_topk = (topk_mode == "seg" or
                    (topk_mode == "auto" and S >= 2 * K * _SEG))
    # the band sort carries (pdf << bits_k) | frontier_pos as one payload
    bits_k = max((K - 1).bit_length(), 1)
    n_pdf = g.num_pdfs
    if (n_pdf - 1).bit_length() + bits_k > 31:
        raise ValueError(
            f"cannot pack pdf ({n_pdf}) and max_active ({K}) into one s32 "
            "sort payload; reduce max_active")

    def relax(al):
        """[B, S] scores -> per-bucket in-arc relaxations."""
        r_lo = jnp.maximum(al[:, g.in_src_lo.reshape(-1)]
                           .reshape(b, S1, g.d_lo)
                           + g.in_w_lo[None], NEG_INF)
        if not S2:
            return r_lo, None
        r_hi = jnp.maximum(al[:, g.in_src_hi.reshape(-1)]
                           .reshape(b, S2, g.d_hi)
                           + g.in_w_hi[None], NEG_INF)
        return r_lo, r_hi

    L = g.eps_depth
    _zbuckets = [(g.eps_z1, g.eps_src_z1, g.eps_w_z1, g.eps_layers_z1),
                 (g.eps_z2, g.eps_src_z2, g.eps_w_z2, g.eps_layers_z2),
                 (g.eps_z3, g.eps_src_z3, g.eps_w_z3, g.eps_layers_z3)]

    def eps_layer(al, r):
        """Topo-layer r of the in-frame eps closure (host latdec.cc's
        topo-order ProcessNonemitting): the z tables are (depth, id)-sorted
        with static per-layer row offsets, so each eps dst is updated ONCE
        per frame from already-closed sources — L× fewer gather lanes than
        re-relaxing every z row each round. Three degree buckets keep the
        padded width near the true arc count."""
        for z, zsrc, zw, layers in _zbuckets:
            if not z.shape[0]:
                continue
            lo, hi = layers[r], layers[r + 1]
            if hi > lo:
                e = zsrc.shape[1]
                rz = jnp.max(
                    al[:, zsrc[lo:hi].reshape(-1)]
                    .reshape(b, hi - lo, e) + zw[None, lo:hi],
                    axis=2)
                al = al.at[:, z[lo:hi]].max(rz)
        return al

    def step(carry, inp):
        alpha, slot_prev = carry
        obs_t, t = inp                                            # [B, P]
        # graph relaxation: every state reads its bucket's in-arcs
        r_lo, r_hi = relax(alpha)
        m = jnp.max(r_lo, axis=2)                                 # [B, S1]
        if S2:
            m = jnp.concatenate([m, jnp.max(r_hi, axis=2)], axis=1)
        live_s = m > 0.5 * NEG_INF
        obs_s = obs_t[:, g.state_pdf]                             # [B, S]
        new_alpha = jnp.where(live_s, m + obs_s, NEG_INF)
        for r in range(L):
            new_alpha = eps_layer(new_alpha, r)
        best = jnp.max(new_alpha, axis=1)                         # [B]
        if use_seg_topk:
            vals, idx = _frontier_top_k(new_alpha, K)             # [B, K]
        else:
            vals, idx = jax.lax.top_k(new_alpha, K)               # [B, K]
        # search frontier: top-K within the search beam shapes the alpha
        # recursion; lattice nodes are the subset within lattice_beam of
        # the frame best (host decoder: latdec_search's per-frame rule).
        # The alpha cutoff applies as a DENSE threshold (min of beam and
        # the Kth-best value) rather than a scatter of the top-K — ties at
        # the Kth value then survive, exactly like the host's inclusive
        # nth-element cutoff, and the [B, S] scatter (plus its layout
        # copies) disappears from the scan.
        keep_k = (vals >= best[:, None] - beam) & (vals > 0.5 * NEG_INF)
        emit_k = keep_k & (vals >= best[:, None] - lattice_beam)
        cutoff = jnp.maximum(best - beam,
                             jnp.where(keep_k[:, K - 1], vals[:, K - 1],
                                       best - beam))[:, None]
        alpha_next = jnp.where(new_alpha >= cutoff, new_alpha, NEG_INF)
        # .max, not .set: under the segment top-K a dead (NEG_INF) entry's
        # clamped index may collide with a live state's — a -1 write must
        # never clobber a real slot (identical to .set when indices are
        # distinct, which is always the case for the plain top_k)
        slot_cur = (jnp.full((b, S), -1, jnp.int32)
                    .at[bi, idx].max(jnp.where(emit_k, slot_ids, -1)))
        # link candidates: a SECOND relaxation over the emitted-masked alpha
        # (another constant-index gather) makes links from unemitted
        # sources NEG_INF by construction; compaction into the [B, K, Dc]
        # frontier band picks each frontier state's row from ITS bucket
        # (the other bucket's lanes are NEG_INF) — the only dynamic-index
        # gathers on big shapes. PK2_DEV_SEARCH_MASK8=1 opt-in: reuse
        # r_lo/r_hi and mask by an int8 emit gather over the SAME constant
        # indices (4x fewer mask bytes, the +w add disappears). Timed on
        # chip (round 3, B=32/T=448 den-HCLG config): identical to the
        # default within noise (7.50 vs 7.50 utt/s full-step) — the second
        # relaxation is already overlapped with the band sort, so the byte
        # saving buys nothing; stays opt-in for future shapes.
        if _mask8():
            emit_prev = (slot_prev >= 0).astype(jnp.int8)         # [B, S]
            l_lo = jnp.where(
                emit_prev[:, g.in_src_lo.reshape(-1)]
                .reshape(b, S1, g.d_lo) > 0,
                r_lo, NEG_INF)
            l_hi = None
            if S2:
                l_hi = jnp.where(
                    emit_prev[:, g.in_src_hi.reshape(-1)]
                    .reshape(b, S2, g.d_hi) > 0,
                    r_hi, NEG_INF)
        else:
            alpha_emit = jnp.where(slot_prev >= 0, alpha, NEG_INF)
            l_lo, l_hi = relax(alpha_emit)
        active = (t < num_frames)[:, None, None]
        lo_m = idx < S1                                           # [B, K]
        idx_lo = jnp.where(lo_m, idx, 0)
        band_lo = jnp.take_along_axis(
            l_lo + obs_s[:, :S1, None],
            idx_lo[:, :, None], axis=1)                           # [B,K,d_lo]
        band_lo = jnp.where(lo_m[:, :, None], band_lo, NEG_INF)
        # per-lane arc attributes (weight, source state) join the band by
        # the same frontier row-gather — they ride the band top-A sort as
        # extra payload operands below, so NO post-top_k [B, A] attribute
        # gathers remain (each cost ~0.2 ms/frame, op-overhead-bound)
        w_band = jnp.take(g.in_w_lo, idx_lo, axis=0)              # [B,K,d_lo]
        src_band = jnp.take(g.in_src_lo, idx_lo, axis=0)
        ol_band = (jnp.take(g.in_ol_lo, idx_lo, axis=0)
                   if return_olabels else None)
        if S2:
            idx_hi = jnp.where(lo_m, 0, idx - S1)
            band_hi = jnp.take_along_axis(
                l_hi + obs_s[:, S1:, None], idx_hi[:, :, None], axis=1)
            band_hi = jnp.where(lo_m[:, :, None], NEG_INF, band_hi)
            link_kd = jnp.concatenate([band_lo, band_hi], axis=2)  # [B,K,Dc]
            w_band = jnp.concatenate(
                [w_band, jnp.take(g.in_w_hi, idx_hi, axis=0)], axis=2)
            src_band = jnp.concatenate(
                [src_band, jnp.take(g.in_src_hi, idx_hi, axis=0)], axis=2)
            if return_olabels:
                ol_band = jnp.concatenate(
                    [ol_band, jnp.take(g.in_ol_hi, idx_hi, axis=0)], axis=2)
        else:
            link_kd = band_lo
        if L:
            # frame 0 only: links from eps-reached initial states fold the
            # start→src eps-chain weight into the stored link weight (their
            # slot is 0; scores already include it through alpha0). The
            # cond keeps the [B, K, Dc] dynamic gather off frames t > 0.
            w_band = jax.lax.cond(
                t == 0,
                lambda wb: jnp.maximum(wb + g.eps0_w[src_band], NEG_INF),
                lambda wb: wb,
                w_band)
        # band top-A: a top_k over the full S*D scores lowers to
        # multi-stage sorts + shard DMAs (~6 ms/frame traced); the exact
        # sort at n = K*Dc is ~0.3 ms, and carrying the payload operands
        # through it costs ~40 us/frame more than lax.top_k while saving
        # four post-top_k gathers. Overflow drops the worst links, counted
        # in `dropped`.
        # with in-frame eps (L > 0) the band also holds EXPANSION CARRIERS:
        # entries whose dst is within the SEARCH beam but not necessarily
        # the lattice beam — the host propagates eps chains through any
        # surviving token, so intermediates must not be lattice-beam-pruned
        # (the final per-dst lattice-beam + emitted-dst filter re-applies
        # after the rounds). L == 0 keeps the tight single-rule band.
        band_thr = beam if L else lattice_beam
        band_keep = keep_k if L else emit_k
        keep_kd = ((link_kd >= vals[:, :, None] - band_thr)
                   & (link_kd > 0.5 * NEG_INF)
                   & band_keep[:, :, None] & active)
        score_kd = jnp.where(keep_kd, link_kd, NEG_INF)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (b, K, Dc), 1)
        pdf_k = g.state_pdf[idx]                                  # [B, K]
        pay = (pdf_k[:, :, None] << bits_k) | kpos          # (pdf<<bk)|kpos
        operands = [(-score_kd).reshape(b, K * Dc),
                    pay.reshape(b, K * Dc),
                    w_band.reshape(b, K * Dc),
                    src_band.reshape(b, K * Dc)]
        if return_olabels:
            operands.append(ol_band.reshape(b, K * Dc))
        sorted_ops = jax.lax.sort(tuple(operands), dimension=1, num_keys=1)
        neg, pay_w, w_w, src_w = sorted_ops[:4]
        pad_a = max(A - K * Dc, 0)   # eps rounds can outgrow K*Dc

        def slice_a(x, fill):
            x = x[:, :A]
            if pad_a:
                x = jnp.pad(x, [(0, 0), (0, pad_a)], constant_values=fill)
            return x

        score_a = slice_a(-neg, NEG_INF)
        pay_a = slice_a(pay_w, 0)
        w_a = slice_a(w_w, NEG_INF)
        src_a = slice_a(src_w, 0)
        ol_a = slice_a(sorted_ops[4], 0) if return_olabels else None
        dropped_t = jnp.maximum(
            jnp.sum(keep_kd.astype(jnp.int32), axis=(1, 2)) - A, 0)
        # in-frame eps rounds on the BAND: each link whose dst state has
        # eps out-arcs spawns folded links to the eps destinations (weight
        # accumulates, pdf/src/olabel ride along) — the runtime equivalent
        # of offline folding, but only for BEAM-SURVIVING combinations, so
        # no arc blowup (DESIGN.md §12). One sort per round caps at A.
        if L:
            pmask = (1 << bits_k) - 1
            dstst = jnp.where(score_a > 0.5 * NEG_INF,
                              idx[bi, pay_a & pmask], 0)       # dst STATE
            d_out = g.eps_out_dst.shape[1]
            # keep-based (search-beam) frontier slot map, LOCAL to the
            # frame: expansion routes through any surviving token
            slot_keep = (jnp.full((b, S), -1, jnp.int32)
                         .at[bi, idx].max(jnp.where(keep_k, slot_ids, -1)))
            # age payload: entries spawned in round r expand ONLY in round
            # r+1 — re-expanding the whole band each round would duplicate
            # every earlier link once per remaining round (each duplicate
            # doubles that path's mass in sum-semiring consumers)
            age_a = jnp.zeros((b, A), jnp.int32)
            for r in range(L):
                va = (score_a > 0.5 * NEG_INF) & (age_a == r)
                cdst = jnp.take(g.eps_out_dst, dstst, axis=0)  # [B,A,Do]
                cw_eps = jnp.take(g.eps_out_w, dstst, axis=0)
                cscore = jnp.where(va[:, :, None],
                                   score_a[:, :, None] + cw_eps, NEG_INF)
                cslot = jnp.take_along_axis(
                    slot_keep, cdst.reshape(b, A * d_out),
                    axis=1).reshape(b, A, d_out)
                calpha = vals[bi[:, :, None],
                              jnp.maximum(cslot, 0)]           # [B,A,Do]
                ok = (cslot >= 0) & (cscore >= calpha - beam)
                cscore = jnp.where(ok, cscore, NEG_INF)
                cpay = (((pay_a[:, :, None] >> bits_k) << bits_k)
                        | jnp.maximum(cslot, 0))
                cw = jnp.where(ok, w_a[:, :, None] + cw_eps, NEG_INF)

                def cat(a0, c):
                    return jnp.concatenate(
                        [a0, c.reshape(b, A * d_out)], axis=1)

                ops2 = [cat(-score_a, -cscore), cat(pay_a, cpay),
                        cat(w_a, cw),
                        cat(src_a, jnp.broadcast_to(
                            src_a[:, :, None], (b, A, d_out))),
                        cat(age_a, jnp.full((b, A, d_out), r + 1,
                                            jnp.int32))]
                if return_olabels:
                    ops2.append(cat(ol_a, jnp.broadcast_to(
                        ol_a[:, :, None], (b, A, d_out))))
                ops2.append(cat(dstst, cdst))
                sorted2 = jax.lax.sort(tuple(ops2), dimension=1, num_keys=1)
                n_valid = jnp.sum((-sorted2[0] > 0.5 * NEG_INF)
                                  .astype(jnp.int32), axis=1)
                dropped_t = dropped_t + jnp.maximum(n_valid - A, 0)
                score_a = -sorted2[0][:, :A]
                pay_a, w_a, src_a = (sorted2[1][:, :A], sorted2[2][:, :A],
                                     sorted2[3][:, :A])
                age_a = sorted2[4][:, :A]
                if return_olabels:
                    ol_a = sorted2[5][:, :A]
                dstst = sorted2[-1][:, :A]
        valid = score_a > 0.5 * NEG_INF
        k_win = pay_a & ((1 << bits_k) - 1)
        if L:
            # final filter: a LINK (as opposed to an expansion carrier)
            # needs an EMITTED dst within the per-dst lattice beam — the
            # same rule the L == 0 band applies up front
            valid = (valid & emit_k[bi, k_win]
                     & (score_a >= vals[bi, k_win] - lattice_beam))
            score_a = jnp.where(valid, score_a, NEG_INF)
        e_src = jnp.where(valid, slot_prev[bi, src_a], 0)
        e_dst = jnp.where(valid, k_win, 0)          # dst slot == frontier pos
        e_pdf = jnp.where(valid, pay_a >> bits_k, 0)
        e_w = jnp.where(valid, w_a, NEG_INF)
        e_ol = (jnp.where(valid, ol_a, 0)
                if return_olabels else jnp.zeros((b, 0), jnp.int32))
        act1 = active[:, :, 0]
        new_carry = (jnp.where(act1, alpha_next, alpha),
                     jnp.where(act1, slot_cur, slot_prev))
        return (new_carry,
                (idx, vals, best, e_src, e_dst, e_pdf, e_w, e_ol, dropped_t))

    obs_t = jnp.swapaxes(obs, 0, 1)                               # [T, B, P]
    ts = jnp.arange(t_len)
    # (scan unroll=2/4 measured EXACTLY neutral here — 699.8/699.7/699.7 ms
    # at the B=32/T=448 on-the-fly config, round 5 — the per-frame cost is
    # the fused relaxation/sort ops themselves, not loop bookkeeping)
    _, (idxs, valss, bests, src_f, dst_f, pdf_f, w_f, ol_f,
        dropped) = jax.lax.scan(step, (alpha0, slot0), (obs_t, ts))

    # ---- finals/scores: each utterance's LAST active frontier (nf == 0
    # degenerates to the initial start token at slot 0) ----
    last_t = jnp.maximum(num_frames - 1, 0)                       # [B]
    has_frames = (num_frames > 0)[:, None]

    def at_last(arr):
        a = jnp.swapaxes(arr, 0, 1)                               # [B, T, K]
        return jnp.take_along_axis(a, last_t[:, None, None], axis=1)[:, 0]

    vals_T = jnp.where(has_frames, at_last(valss),
                       jnp.full((b, K), NEG_INF).at[:, 0].set(0.0))
    idx_T = jnp.where(has_frames, at_last(idxs), g.start)
    best_T = jnp.max(vals_T, axis=1)
    keep_T = (vals_T >= best_T[:, None] - beam) & (vals_T > 0.5 * NEG_INF)
    emit_T = keep_T & (vals_T >= best_T[:, None] - lattice_beam)
    slot_alpha = jnp.where(keep_T, vals_T, NEG_INF)
    final_slots = jnp.where(keep_T, g.final[idx_T], NEG_INF)
    # host-decoder final semantics: best score = max(alpha + final) over the
    # SEARCH tokens, falling back to max(alpha) when no token is final; the
    # emitted lattice's finals live on emitted end slots, all weight-0 when
    # none of them is a final state (latdec_emit_lattice fallback)
    with_final = slot_alpha + final_slots
    has_final = jnp.max(with_final, axis=1) > 0.5 * NEG_INF
    scores = jnp.where(has_final, jnp.max(with_final, axis=1),
                       jnp.max(slot_alpha, axis=1))
    emit_final = jnp.where(emit_T, final_slots, NEG_INF)
    emit_has_final = jnp.max(emit_final, axis=1) > 0.5 * NEG_INF
    final_out = jnp.where(emit_has_final[:, None], emit_final,
                          jnp.where(emit_T, 0.0, NEG_INF))
    lat = TimeSyncLattice(
        src=jnp.swapaxes(src_f, 0, 1), dst=jnp.swapaxes(dst_f, 0, 1),
        pdf=jnp.swapaxes(pdf_f, 0, 1), weight=jnp.swapaxes(w_f, 0, 1),
        final=final_out)
    n_dropped = jnp.sum(jnp.swapaxes(dropped, 0, 1), axis=1)
    if os.environ.get("PK2_DEV_SEARCH_DEBUG") == "1":
        # diagnosis-only extra return: per-frame frontier (state ids,
        # closed alphas, frame best) so emit-rule decisions can be
        # replayed on the host (tools/, not a stable API)
        dbg = (jnp.swapaxes(idxs, 0, 1), jnp.swapaxes(valss, 0, 1),
               jnp.swapaxes(bests, 0, 1))
        if return_olabels:
            return lat, scores, n_dropped, jnp.swapaxes(ol_f, 0, 1), dbg
        return lat, scores, n_dropped, dbg
    if return_olabels:
        return lat, scores, n_dropped, jnp.swapaxes(ol_f, 0, 1)
    return lat, scores, n_dropped


def banded_to_fsas(lat: TimeSyncLattice, num_frames, olabels=None):
    """Banded device lattices → per-utterance ``(DenseFsa, frames)`` pairs.

    The output matches ``LatticeDecoder.decode_lattice(with_frames=True)``'s
    contract (time-synchronous DenseFsa, graph-score weights, state 0 at
    frame 0, ``frames[dst] == frames[src] + 1``), so everything downstream —
    ``lattice_word_fst``, N-best, oracle, MBR/consensus, LM-scale re-folds —
    consumes device-decoded lattices unchanged.  ``olabels`` [B, T, A] (from
    ``device_lattice_generate(..., return_olabels=True)``) attaches word
    labels.  States unable to reach a final state (the beam search keeps
    dead branches the host decoder's backward prune removes) are trimmed
    here with a backward sweep.

    Two equivalent implementations (VERDICT r3 item 4 — this epilogue, not
    the TPU search, dominated dev_eval):
      - native (default): one cache-friendly C pass per utterance
        (``native/latdec.cc banded_trim_extract``), ~50x the numpy form at
        the B=16/T=300/A=1024 worst case. ``PK2_B2F_NATIVE=0`` disables.
      - numpy fallback: BATCH-vectorized (liveness is one [B, T+1, K] flat
        scatter, the backward trim loops over T — not B×T — dense over
        [B, A], arc extraction is ONE global nonzero split by searchsorted).
        Still gather-bound: nine ~5M-row random ``np.take`` calls ≈ 2.8 s
        warm at the worst case (the first per-utterance formulation was
        5.9 s).

    Device inputs are band-compacted BEFORE the device→host copy: the band
    sort orders every frame's links best-first with NEG_INF padding last,
    so valid links are a prefix of the A axis and slicing to the smallest
    128-multiple bucket ≥ the batch's true max link count drops ONLY
    padding — identical lattices, 4-8× fewer D2H bytes on typically-sparse
    eval bands (through a remote-device tunnel the copy, not the search,
    dominated dev_eval e2e). ``PK2_B2F_COMPACT=0`` disables.
    """
    lat, olabels = _compact_band(lat, olabels)
    if os.environ.get("PK2_B2F_NATIVE", "1") != "0":
        try:
            return _banded_to_fsas_native(lat, num_frames, olabels)
        except OSError:                     # toolchain missing: numpy path
            pass
        except subprocess.CalledProcessError:   # make present, compile fails
            pass
        except AttributeError:              # stale .so w/o banded_trim_extract
            pass
    return _banded_to_fsas_np(lat, num_frames, olabels)


def _compact_band(lat: TimeSyncLattice, olabels, min_a: int = 128):
    """Slice the band (A) axis to the smallest 128-multiple bucket covering
    every frame's valid-link count. Valid links are a per-frame PREFIX of
    the A axis (they come out of the frame-end band sort best-first, padding
    last), so the slice removes only NEG_INF padding — the converted
    lattices are identical. Bucketing (instead of the exact max) bounds the
    downstream shape set to ≤ A/128 shapes while keeping the last axis
    lane-aligned (128-multiples, not powers of two: the round-5 occupancy
    measurement found a 375-link true max on the 800-wide bench band, where
    pow2 pays for 512 and a 128-multiple pays for 384 — 404 vs 312 ms
    lattice-FB). The one-scalar device sync it costs happens right where
    the conversion was about to sync the full arrays anyway (eval path) or
    right before the train step needs the shape (OTF train path)."""
    if os.environ.get("PK2_B2F_COMPACT", "1") == "0":
        return lat, olabels
    a_dim = lat.src.shape[2]
    if a_dim <= min_a:
        return lat, olabels
    w = jnp.asarray(lat.weight)
    m = int(jnp.max(jnp.sum(w > 0.5 * NEG_INF, axis=2)))
    bucket = max(min_a, -(-max(m, 1) // 128) * 128)
    if bucket >= a_dim:
        return lat, olabels

    def sl(x):
        return x[:, :, :bucket]

    lat2 = TimeSyncLattice(src=sl(lat.src), dst=sl(lat.dst),
                           pdf=sl(lat.pdf), weight=sl(w), final=lat.final)
    return lat2, (None if olabels is None else
                  jnp.asarray(olabels)[:, :, :bucket])


def _banded_to_fsas_native(lat: TimeSyncLattice, num_frames, olabels=None):
    """C-pass epilogue; bit-identical outputs to ``_banded_to_fsas_np``
    (covered by tests/test_device_lattice.py parity)."""
    import ctypes

    from pykaldi2_tpu.decode.decoder import _fptr, _iptr, _load
    from pykaldi2_tpu.ops.fsa import DenseFsa

    lib = _load()
    ci = np.ascontiguousarray
    src_all = ci(np.asarray(lat.src, np.int32))
    dst_all = ci(np.asarray(lat.dst, np.int32))
    pdf_all = ci(np.asarray(lat.pdf, np.int32))
    w_all = ci(np.asarray(lat.weight, np.float32))
    fin_all = ci(np.asarray(lat.final, np.float32))
    ol_all = None if olabels is None else ci(np.asarray(olabels, np.int32))
    nf_all = ci(np.clip(np.asarray(num_frames), 0, None).astype(np.int32))
    b, t_dim, a_dim = src_all.shape
    k = lat.num_slots
    n_states = np.zeros(b, np.int32)
    n_arcs = np.zeros(b, np.int32)
    cap = t_dim * a_dim
    out_src = np.empty((b, cap), np.int32)
    out_dst = np.empty((b, cap), np.int32)
    out_pdf = np.empty((b, cap), np.int32)
    out_w = np.empty((b, cap), np.float32)
    out_ol = None if ol_all is None else np.empty((b, cap), np.int32)
    out_frames = np.empty((b, (t_dim + 1) * k), np.int32)
    out_final_sid = np.empty((b, k), np.int32)
    null_i = ctypes.POINTER(ctypes.c_int)()
    rc = lib.banded_trim_extract(
        b, t_dim, a_dim, k, _iptr(src_all), _iptr(dst_all), _iptr(pdf_all),
        _fptr(w_all), null_i if ol_all is None else _iptr(ol_all),
        _fptr(fin_all), _iptr(nf_all), ctypes.c_float(0.5 * NEG_INF),
        _iptr(n_states), _iptr(n_arcs), _iptr(out_src), _iptr(out_dst),
        _iptr(out_pdf), _fptr(out_w),
        null_i if out_ol is None else _iptr(out_ol),
        _iptr(out_frames), _iptr(out_final_sid))
    assert rc == 0
    out = []
    empty_i32 = np.zeros(0, np.int32)
    for i in range(b):
        nf = int(nf_all[i])
        if nf <= 0:
            fsa = DenseFsa(1, empty_i32, empty_i32, empty_i32,
                           np.zeros(0, np.float32),
                           np.zeros(1, np.float32), 0, None,
                           None if ol_all is None else empty_i32)
            out.append((fsa, np.zeros(1, np.int64)))
            continue
        ns, na = int(n_states[i]), int(n_arcs[i])
        final = np.full(ns, -np.inf, np.float32)
        last_sid = out_final_sid[i]
        last = np.nonzero(last_sid >= 0)[0]
        # NEG_INF sentinels must become true -inf: downstream
        # (lattice_word_fst) treats any finite value as a real final
        fv = fin_all[i, last]
        final[last_sid[last]] = np.where(fv > 0.5 * NEG_INF, fv, -np.inf)
        fsa = DenseFsa(
            ns, out_src[i, :na].copy(), out_dst[i, :na].copy(),
            out_pdf[i, :na].copy(), out_w[i, :na].copy(), final, 0, None,
            None if out_ol is None else out_ol[i, :na].copy())
        out.append((fsa.validate(), out_frames[i, :ns].astype(np.int64)))
    return out


def _banded_to_fsas_np(lat: TimeSyncLattice, num_frames, olabels=None):
    """Pure-numpy epilogue (fallback + parity reference)."""
    from pykaldi2_tpu.ops.fsa import DenseFsa

    src_all = np.asarray(lat.src)
    dst_all = np.asarray(lat.dst)
    pdf_all = np.asarray(lat.pdf)
    w_all = np.asarray(lat.weight)
    fin_all = np.asarray(lat.final)
    ol_all = None if olabels is None else np.asarray(olabels)
    b, t_dim, a_dim = src_all.shape
    k = lat.num_slots
    # clip nf to [0, t_dim], matching the native wrapper (which clips to
    # >=0 host-side and clamps T<=t_dim in C) — unclipped nf>t_dim raised
    # IndexError and nf<0 silently wrapped here (ADVICE r4)
    nf_all = np.clip(np.asarray(num_frames, np.int64), 0, t_dim)
    t_act = np.arange(t_dim)[None, :, None] < nf_all[:, None, None]
    valid = (w_all > 0.5 * NEG_INF) & t_act                   # [B, T, A]

    # flat [B*(T+1)*K] addressing (np.take on flat int indices measures ~2x
    # the three-index-array fancy gathers at these sizes)
    base_bt = ((np.arange(b, dtype=np.int64)[:, None, None] * (t_dim + 1)
                + np.arange(t_dim, dtype=np.int64)[None, :, None]) * k)
    src_flat = base_bt + src_all                              # [B, T, A]
    dst_flat = base_bt + k + dst_all

    # liveness: one flat scatter over [B, T+1, K] (live[b, t+1, dst])
    live = np.zeros((b, t_dim + 1, k), bool)
    live[:, 0, 0] = True
    live.reshape(-1)[dst_flat[valid]] = True

    # backward trim, batched: alive[:, t] from alive[:, t+1] — T iterations
    # of [B, A]-wide ops instead of B×T scalar-loop steps. Variable nf is
    # handled by seeding each utterance's own last frame (t_act masks arcs
    # past nf, so shorter utterances stay frozen through later t).
    alive = np.zeros((b, t_dim + 1, k), bool)
    is_fin = fin_all > 0.5 * NEG_INF                          # [B, K]
    alive[np.arange(b), nf_all] = live[np.arange(b), nf_all] & is_fin
    bcol = np.arange(b)[:, None]                              # [B, 1]
    bmat = np.broadcast_to(bcol, (b, a_dim))
    for t in range(t_dim - 1, -1, -1):
        v = valid[:, t] & alive[:, t + 1][bcol, dst_all[:, t]]  # [B, A]
        alive[bmat[v], t, src_all[:, t][v]] = True
    alive &= live
    # degenerate utterances (band overflow cut every final-reaching path):
    # fall back to forward liveness for THOSE rows only
    degen = ~alive[:, 0, 0]
    if degen.any():
        alive[degen] = live[degen]

    # per-utterance state ids: cumsum over each utterance's alive grid,
    # valid frames only (t ≤ nf) — states past nf are never referenced
    t_keep = np.arange(t_dim + 1)[None, :, None] <= nf_all[:, None, None]
    alive &= t_keep
    flat_alive = alive.reshape(b, -1)
    sid = flat_alive.cumsum(axis=1, dtype=np.int64) - 1       # [B,(T+1)*K]
    n_states = flat_alive.sum(axis=1)                         # [B]
    sid = sid.reshape(b, t_dim + 1, k)

    # arc extraction: ONE flat nonzero over the whole batch, split by
    # utterance (keep indices flat; all gathers are np.take on flat ids)
    alive_flat = alive.reshape(-1)
    keep = (valid & np.take(alive_flat, src_flat)
            & np.take(alive_flat, dst_flat))
    e_flat = np.flatnonzero(keep)
    e_b = e_flat // (t_dim * a_dim)
    splits = np.searchsorted(e_b, np.arange(1, b))
    sid_flat = sid.reshape(-1)
    fsa_src = np.take(sid_flat, np.take(src_flat.reshape(-1), e_flat)
                      ).astype(np.int32)
    fsa_dst = np.take(sid_flat, np.take(dst_flat.reshape(-1), e_flat)
                      ).astype(np.int32)
    e_pdf = np.take(pdf_all.reshape(-1), e_flat).astype(np.int32, copy=False)
    e_w = np.take(w_all.reshape(-1), e_flat).astype(np.float32, copy=False)
    e_ol = (None if ol_all is None
            else np.take(ol_all.reshape(-1), e_flat)
            .astype(np.int32, copy=False))
    frames_grid = np.broadcast_to(np.arange(t_dim + 1)[None, :, None],
                                  alive.shape)

    out = []
    empty_i32 = np.zeros(0, np.int32)
    for i, (s0, s1) in enumerate(zip(
            np.concatenate([[0], splits]),
            np.concatenate([splits, [len(e_b)]]))):
        nf = int(nf_all[i])
        if nf <= 0:
            fsa = DenseFsa(1, empty_i32, empty_i32, empty_i32,
                           np.zeros(0, np.float32),
                           np.zeros(1, np.float32), 0, None,
                           None if ol_all is None else empty_i32)
            out.append((fsa, np.zeros(1, np.int64)))
            continue
        frames = frames_grid[i][alive[i]]
        ns = int(n_states[i])
        final = np.full(ns, -np.inf, np.float32)
        last = np.nonzero(alive[i, nf])[0]
        # NEG_INF sentinels must become true -inf: downstream
        # (lattice_word_fst) treats any finite value as a real final
        fv = fin_all[i, last]
        final[sid[i, nf, last]] = np.where(fv > 0.5 * NEG_INF, fv, -np.inf)
        fsa = DenseFsa(
            ns, fsa_src[s0:s1], fsa_dst[s0:s1], e_pdf[s0:s1], e_w[s0:s1],
            final, 0, None,
            None if ol_all is None else e_ol[s0:s1])
        out.append((fsa.validate(), frames))
    return out
