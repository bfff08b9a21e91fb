"""On-device batched beam-search lattice generation.

Completes the TPU-first redesign of the reference's signature feature
(pykaldi2's on-the-fly denominator lattices, SURVEY.md §4.2 / §8 hard-part 2,
VERDICT r2 item 1): where the reference ships [B, T, P] posteriors to the CPU
and runs Kaldi's LatticeFasterDecoder per utterance, this module runs the
beam-pruned search for the WHOLE batch on the TPU and emits the banded
``ops/fb_lattice.TimeSyncLattice`` directly in HBM — no device→host copy, no
host decode, and the same-step parameters (the host pipeline had to use
one-step-stale ones to overlap).

The TPU-idiomatic shape of "beam search": on a CPU, beams exist to SKIP work
(tokens never materialize). On a TPU, the dense relaxation over all E arcs
per frame is regular, vectorized work the VPU does well at denominator-graph
scale (~100k arcs) — so the search relaxes EVERYTHING densely in the max
semiring, and the beam / max_active / lattice_beam prune what becomes
LATTICE STRUCTURE, exactly mirroring the host decoder's emitted lattices
(native/latdec.cc):

  per frame t (one ``lax.scan`` step, all static shapes):
    relax[b,e]     = alpha[b, src[e]] + w[e]                (graph relaxation)
    newalpha[b,s]  = max_e→s relax + obs_t[b, pdf(s)]       (dst-emission
                     invariant: compiler graphs put the pdf on the dst state)
    frontier       = top-K states by newalpha, within `beam` of the best
                     (K = max_active)
    kept links     = arcs into frontier states whose path score is within
                     `lattice_beam` of the state's best, from live prev-frame
                     slots → compacted into an [B, A] arc band
    alpha          = newalpha masked to the frontier (pruning shapes the
                     search, as in the host decoder)

Graphs must be input-epsilon-free with the destination-emission invariant —
what ``graph/compile.expand_to_pdf_fst`` / ``make_decode_graph`` emit (their
junctions are collapsed); graphs with eps arcs are folded offline by
``remove_input_epsilons`` in ``pack_decode_graph`` (source-side folding
preserves the invariant). Intended scale: denominator/phone-loop HCLGs (the
on-the-fly SE hot path). Word-HCLG eval decoding at millions of states stays
on the host C++ decoder.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.graph.fst import EPS, Fst
from pykaldi2_tpu.ops.fb import NEG_INF, _seg_max
from pykaldi2_tpu.ops.fb_lattice import TimeSyncLattice


class DeviceDecodeGraph(NamedTuple):
    """Arc tables + per-state emissions for the on-device search.

    ``start``/``num_states`` are static metadata (they shape the compiled
    program), so the pytree flattening below keeps them out of the traced
    leaves — one compilation per graph topology, as with bucketed shapes.
    """

    src: jax.Array        # [E] int32
    dst: jax.Array        # [E] int32
    weight: jax.Array     # [E] f32 log-prob graph score (incl. word penalty)
    arc_pdf: jax.Array    # [E] int32 == state_pdf[dst] (emission of the arc)
    state_pdf: jax.Array  # [S] int32
    final: jax.Array      # [S] f32 log-prob, NEG_INF where non-final
    start: int
    num_states: int


jax.tree_util.register_pytree_node(
    DeviceDecodeGraph,
    lambda g: ((g.src, g.dst, g.weight, g.arc_pdf, g.state_pdf, g.final),
               (g.start, g.num_states)),
    lambda aux, leaves: DeviceDecodeGraph(*leaves, *aux))


def pack_decode_graph(fst: Fst, word_penalty: float = 0.0) -> DeviceDecodeGraph:
    """pdf-level decode FST (ilabel = pdf+1, olabel = word) → device tables.

    Input-epsilon arcs (word-LM backoff/junction arcs in HCLG-scale graphs)
    are folded away offline — `remove_input_epsilons` folds the closure on
    the SOURCE side (s --eps*--> c --emit--> x  ⇒  s --emit--> x), which
    keeps the destination-emission invariant the search relies on.
    """
    if any(a.ilabel == EPS for s in range(fst.num_states) for a in fst.arcs[s]):
        fst = fst.remove_input_epsilons()
    from pykaldi2_tpu.decode.on_device import dense_from_pdf_fst
    from pykaldi2_tpu.ops.fb_dense import state_emission_pdfs

    dense = dense_from_pdf_fst(fst, word_penalty)
    state_pdf = state_emission_pdfs(dense)
    if state_pdf is None:
        raise ValueError(
            "decode graph violates the destination-emission invariant "
            "(arcs into one state carry different pdfs); the device search "
            "needs compiler-emitted graphs (expand_to_pdf_fst)")
    w = np.nan_to_num(np.asarray(dense.weight, np.float32),
                      neginf=NEG_INF, posinf=NEG_INF)
    final = np.nan_to_num(np.asarray(dense.final, np.float32),
                          neginf=NEG_INF, posinf=NEG_INF)
    return DeviceDecodeGraph(
        src=jnp.asarray(dense.src), dst=jnp.asarray(dense.dst),
        weight=jnp.asarray(w),
        arc_pdf=jnp.asarray(state_pdf[np.asarray(dense.dst)]),
        state_pdf=jnp.asarray(state_pdf),
        final=jnp.asarray(final),
        start=int(dense.start), num_states=int(dense.num_states))


@functools.partial(jax.jit, static_argnames=("max_active", "max_arcs",
                                             "beam", "lattice_beam"))
def device_lattice_generate(
    obs: jax.Array,
    graph: DeviceDecodeGraph,
    num_frames: jax.Array,
    *,
    max_active: int = 256,
    max_arcs: int = 1024,
    beam: float = 16.0,
    lattice_beam: float = 8.0,
) -> Tuple[TimeSyncLattice, jax.Array, jax.Array]:
    """Batched beam search → (TimeSyncLattice, best scores [B], dropped [B]).

    obs [B, T, P]: acoustic-scaled scores (same matrix the FB kernels will
    consume). Returns the banded lattice (slots = frontier positions,
    K = max_active, A = max_arcs per frame), the best end-to-end path
    log-score per utterance (final weights folded, host-decoder fallback
    when no final state survives), and the number of lattice links dropped
    to the [B, A] band cap (0 everywhere ⇒ the band was wide enough; callers
    should widen ``max_arcs`` or tighten ``lattice_beam`` otherwise).

    Differentiation: lattice STRUCTURE is data, not a differentiable
    quantity — call under ``stop_gradient``-ed obs (the SE loss re-folds obs
    through the lattice's pdf labels with its own VJP).
    """
    b, t_len, _p = obs.shape
    g = graph
    S = g.num_states
    K, A = min(max_active, S), max_arcs
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]

    alpha0 = jnp.full((b, S), NEG_INF, jnp.float32).at[:, g.start].set(0.0)
    slot_of0 = jnp.full((b, S), -1, jnp.int32).at[:, g.start].set(0)
    slot_alpha0 = jnp.full((b, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    final_slots0 = jnp.full((b, K), NEG_INF, jnp.float32).at[:, 0].set(g.final[g.start])
    emit0 = jnp.zeros((b, K), bool).at[:, 0].set(True)

    def step(carry, inp):
        alpha, slot_of_prev, slot_alpha, final_slots, emitted = carry
        obs_t, t = inp                                            # [B, P]
        relax = jnp.maximum(alpha[:, g.src] + g.weight[None, :], NEG_INF)
        m = _seg_max(relax.T, g.dst, S).T                         # [B, S]
        live_s = m > 0.5 * NEG_INF
        new_alpha = jnp.where(live_s, m + obs_t[:, g.state_pdf], NEG_INF)
        best = jnp.max(new_alpha, axis=1, keepdims=True)          # [B, 1]
        vals, idx = jax.lax.top_k(new_alpha, K)                   # [B, K]
        # search frontier: top-K within the search beam (shapes the alpha
        # recursion); lattice nodes: the subset within lattice_beam of the
        # frame best (host decoder: latdec_search's per-frame `ids` rule)
        keep_k = (vals >= best - beam) & (vals > 0.5 * NEG_INF)
        emit_k = keep_k & (vals >= best - lattice_beam)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (b, K), 1)
        slot_of = (jnp.full((b, S), -1, jnp.int32)
                   .at[bi, idx].set(jnp.where(emit_k, slot_ids, -1)))
        alpha_next = (jnp.full((b, S), NEG_INF, jnp.float32)
                      .at[bi, idx].set(jnp.where(keep_k, vals, NEG_INF)))
        # lattice links: within lattice_beam of the dst state's (pre-prune)
        # best, endpoints on emitted lattice nodes
        link_score = relax + obs_t[:, g.arc_pdf]                  # [B, E]
        dst_slot = slot_of[:, g.dst]
        src_slot = slot_of_prev[:, g.src]
        active = (t < num_frames)[:, None]                        # [B, 1]
        keep_e = ((link_score >= new_alpha[:, g.dst] - lattice_beam)
                  & (link_score > 0.5 * NEG_INF)
                  & (dst_slot >= 0) & (src_slot >= 0) & active)
        pos = jnp.cumsum(keep_e.astype(jnp.int32), axis=1) - 1    # [B, E]
        n_kept = pos[:, -1] + 1
        dropped_t = jnp.maximum(n_kept - A, 0)
        write = jnp.where(keep_e & (pos < A), pos, A)

        def emit(vals_e, fill, dt):
            out = jnp.full((b, A + 1), fill, dt)
            return out.at[bi, write].set(vals_e.astype(dt),
                                         mode="drop")[:, :A]

        e_src = emit(jnp.maximum(src_slot, 0), 0, jnp.int32)
        e_dst = emit(jnp.maximum(dst_slot, 0), 0, jnp.int32)
        e_pdf = emit(jnp.broadcast_to(g.arc_pdf[None, :], (b, relax.shape[1])),
                     0, jnp.int32)
        e_w = emit(jnp.where(keep_e, g.weight[None, :], NEG_INF),
                   NEG_INF, jnp.float32)
        # freeze everything past each utterance's last frame
        alpha = jnp.where(active, alpha_next, alpha)
        slot_of_out = jnp.where(active, slot_of, slot_of_prev)
        slot_alpha = jnp.where(active, jnp.where(keep_k, vals, NEG_INF), slot_alpha)
        final_slots = jnp.where(active,
                                jnp.where(keep_k, g.final[idx], NEG_INF),
                                final_slots)
        emitted = jnp.where(active, emit_k, emitted)
        return ((alpha, slot_of_out, slot_alpha, final_slots, emitted),
                (e_src, e_dst, e_pdf, e_w, dropped_t))

    obs_t = jnp.swapaxes(obs, 0, 1)                               # [T, B, P]
    ts = jnp.arange(t_len)
    (_, _, slot_alpha, final_slots, emitted), (src_f, dst_f, pdf_f, w_f, dropped) = \
        jax.lax.scan(step, (alpha0, slot_of0, slot_alpha0, final_slots0, emit0),
                     (obs_t, ts))

    # host-decoder final semantics: best score = max(alpha + final) over the
    # SEARCH tokens, falling back to max(alpha) when no token is final; the
    # emitted lattice's finals live on emitted end slots, all weight-0 when
    # none of them is a final state (latdec_emit_lattice fallback)
    with_final = slot_alpha + final_slots
    has_final = jnp.max(with_final, axis=1) > 0.5 * NEG_INF
    scores = jnp.where(has_final, jnp.max(with_final, axis=1),
                       jnp.max(slot_alpha, axis=1))
    emit_final = jnp.where(emitted, final_slots, NEG_INF)
    emit_has_final = jnp.max(emit_final, axis=1) > 0.5 * NEG_INF
    final_out = jnp.where(emit_has_final[:, None], emit_final,
                          jnp.where(emitted, 0.0, NEG_INF))
    lat = TimeSyncLattice(
        src=jnp.swapaxes(src_f, 0, 1), dst=jnp.swapaxes(dst_f, 0, 1),
        pdf=jnp.swapaxes(pdf_f, 0, 1), weight=jnp.swapaxes(w_f, 0, 1),
        final=final_out)
    return lat, scores, jnp.sum(jnp.swapaxes(dropped, 0, 1), axis=1)
