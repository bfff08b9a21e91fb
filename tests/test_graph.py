"""Graph layer tests: transition model, FST ops, compilers, forced alignment."""

import numpy as np
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.graph import (
    Fst,
    HmmTopology,
    TransitionModel,
    estimate_phone_bigram,
    make_den_graph,
    make_linear_num_graph,
    make_num_graph,
)
from pykaldi2_tpu.graph.fst import EPS, linear_acceptor, make_lexicon_fst
from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
from pykaldi2_tpu.ops.fb import fsa_logz, fsa_occupancies, fsa_viterbi, pack_graph


PHONES = [1, 2, 3]


def _tm(nstates=1):
    topo = (HmmTopology.one_state if nstates == 1 else HmmTopology.three_state)(PHONES)
    return TransitionModel(topo)


def test_transition_model_mappings():
    tm = _tm(3)
    assert tm.num_pdfs == 9
    t2p = tm.tid_to_pdf_array()
    t2ph = tm.tid_to_phone_array()
    assert t2p[0] == -1
    # each phone has 3 states x 2 transitions = 6 tids
    assert tm.num_tids == 18
    assert (t2ph[1:7] == 1).all() and (t2ph[7:13] == 2).all()
    sl = tm.tid_is_self_loop_array()
    assert sl[1:].sum() == 9  # one self-loop per (phone, state)


def test_transition_model_kaldi_roundtrip(tmp_path):
    tm = _tm(3)
    p = str(tmp_path / "final.mdl")
    tm.write_kaldi(p)
    tm2 = TransitionModel.read_kaldi(p)
    assert tm2.num_tids == tm.num_tids and tm2.num_pdfs == tm.num_pdfs
    np.testing.assert_array_equal(tm2.tid_to_pdf_array(), tm.tid_to_pdf_array())
    np.testing.assert_allclose(tm2.log_probs, tm.log_probs, rtol=1e-6)


def test_fst_compose_and_text_roundtrip(tmp_path):
    # A: maps 1->10, 2->20 ; B accepts 10 20
    a = Fst()
    s0 = a.add_state(); a.set_start(s0); a.set_final(s0)
    a.add_arc(s0, 1, 10, -0.5, s0)
    a.add_arc(s0, 2, 20, -0.25, s0)
    b = linear_acceptor([10, 20])
    c = a.compose(b)
    # exactly one accepting path: ilabels 1,2 with weight -0.75
    assert c.num_states == 3
    p = str(tmp_path / "c.fst.txt")
    c.write_text(p)
    c2 = Fst.read_text(p)
    assert c2.num_states == c.num_states and c2.num_arcs == c.num_arcs


def test_linear_num_graph_alignment():
    tm = _tm(1)
    g = make_linear_num_graph(tm, [1, 2, 1])
    assert g.num_states == 4  # start + 3 phone states
    packed = pack_graph(g)
    # obs strongly favoring durations 2, 3, 2 of pdfs 0,1,0
    T = 7
    ref = [0, 0, 1, 1, 1, 0, 0]
    obs = np.full((1, T, tm.num_pdfs), -10.0, np.float32)
    for t, p in enumerate(ref):
        obs[0, t, p] = 0.0
    score, arcs = fsa_viterbi(jnp.asarray(obs), packed, jnp.asarray([T]))
    pdfs = np.asarray(packed.pdf)[np.asarray(arcs)[0]]
    np.testing.assert_array_equal(pdfs, ref)
    # logZ must be finite (some path exists) and >= viterbi score
    lz = float(fsa_logz(jnp.asarray(obs), packed, jnp.asarray([T]))[0])
    assert lz >= float(score[0]) - 1e-4


def test_num_graph_from_transcript_with_lexicon():
    tm = _tm(1)
    lexicon = {"ab": [[1, 2]], "c": [[3], [1, 3]]}
    word_ids = {"ab": 1, "c": 2}
    g = make_num_graph(tm, ["ab", "c"], lexicon, word_ids)
    packed = pack_graph(g)
    T = 4
    # path a b c c should be accepted: pdfs 0 1 2 2
    obs = np.full((1, T, tm.num_pdfs), -8.0, np.float32)
    for t, p in enumerate([0, 1, 2, 2]):
        obs[0, t, p] = 0.0
    lz = float(fsa_logz(jnp.asarray(obs), packed, jnp.asarray([T]))[0])
    assert np.isfinite(lz)
    # a path violating the transcript (all pdf 0) has vanishing probability
    score, arcs = fsa_viterbi(jnp.asarray(obs), packed, jnp.asarray([T]))
    pdfs = np.asarray(packed.pdf)[np.asarray(arcs)[0]]
    assert pdfs.tolist() in ([0, 1, 2, 2], [0, 0, 1, 2], [0, 1, 0, 2])


def test_phone_lm_normalizes():
    seqs = [[1, 2, 3], [1, 1, 2], [3, 2]]
    lm = estimate_phone_bigram(seqs, PHONES, smoothing=0.5)
    for p in PHONES:
        tot = np.exp(lm["log_bigram"][p, PHONES]).sum() + np.exp(lm["log_final"][p])
        np.testing.assert_allclose(tot, 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.exp(lm["log_init"][PHONES]).sum(), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(collapse_to_phones([1, 1, 2, 2, 2, 1]), [1, 2, 1])


@pytest.mark.parametrize("nstates", [1, 3])
def test_den_graph_posteriors_normalize(nstates):
    tm = _tm(nstates)
    lm = estimate_phone_bigram([[1, 2, 3], [2, 1]], PHONES)
    den = make_den_graph(tm, lm)
    packed = pack_graph(den)
    rng = np.random.RandomState(0)
    T = 12 if nstates == 1 else 15  # 3-state needs >= 3 frames per phone
    obs = rng.randn(2, T, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([T, T - 3])
    lz, gamma = fsa_occupancies(jnp.asarray(obs), packed, lens)
    gamma = np.asarray(gamma)
    assert np.isfinite(np.asarray(lz)).all()
    np.testing.assert_allclose(gamma[0].sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(gamma[1, : T - 3].sum(-1), 1.0, atol=1e-4)
    assert (gamma[1, T - 3 :] == 0).all()


def test_den_graph_includes_num_path():
    """logZ_den over all sequences >= LM-weighted score of any single path."""
    tm = _tm(1)
    lm = estimate_phone_bigram([[1, 2], [2, 3]], PHONES)
    den = pack_graph(make_den_graph(tm, lm))
    rng = np.random.RandomState(1)
    obs = rng.randn(1, 6, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([6])
    lz_den = float(fsa_logz(jnp.asarray(obs), den, lens)[0])
    v_score, _ = fsa_viterbi(jnp.asarray(obs), den, lens)
    assert lz_den >= float(v_score[0]) - 1e-5


def test_remove_input_epsilons_rejects_cycles():
    """A cyclic eps subgraph silently dropped weight mass before; now raises."""
    import pytest
    from pykaldi2_tpu.graph.fst import EPS, Fst

    f = Fst()
    a, b = f.add_state(), f.add_state()
    f.set_start(a)
    f.add_arc(a, EPS, EPS, -0.5, b)
    f.add_arc(b, EPS, EPS, -0.5, a)   # eps cycle
    f.add_arc(a, 1, 1, 0.0, b)
    f.set_final(b, 0.0)
    with pytest.raises(ValueError, match="epsilon cycle"):
        f.remove_input_epsilons()
    # acyclic eps still fine
    g = Fst()
    s0, s1, s2 = g.add_state(), g.add_state(), g.add_state()
    g.set_start(s0)
    g.add_arc(s0, EPS, EPS, -0.1, s1)
    g.add_arc(s1, 2, 2, 0.0, s2)
    g.set_final(s2, 0.0)
    out = g.remove_input_epsilons()
    assert out.num_states > 0


def test_remove_input_epsilons_parallel_routes_semiring():
    """Parallel eps routes between the same state pair fold by the semiring
    plus: tropical keeps the best route (Viterbi/decode semantics), log
    log-adds them (sum-exact for FB consumers). The old DFS closure both
    Viterbi-collapsed parallel routes AND emitted duplicate arcs with stale
    weights when a route improved after first visit — each folded (s -> c)
    pair must now appear exactly once."""
    from pykaldi2_tpu.graph.fst import EPS, Fst

    # two eps routes start->c: direct (-0.7) and via mid (-0.2 + -0.3 = -0.5)
    f = Fst()
    start, mid, c, end = (f.add_state() for _ in range(4))
    f.set_start(start)
    f.add_arc(start, EPS, EPS, -0.7, c)
    f.add_arc(start, EPS, EPS, -0.2, mid)
    f.add_arc(mid, EPS, EPS, -0.3, c)
    f.add_arc(c, 1, 1, -0.1, end)
    f.set_final(end, 0.0)
    f.set_final(c, -0.05)

    trop = f.remove_input_epsilons()          # default: tropical
    logf = f.remove_input_epsilons("log")
    for out in (trop, logf):
        arcs = [(a.ilabel, a.weight, a.nextstate) for a in out.arcs[out.start]
                if a.nextstate != out.start]
        emit = [a for a in arcs if a[0] == 1]
        assert len(emit) == 1, f"duplicate folded arcs: {arcs}"
    w_best = max(-0.7, -0.5)
    w_sum = np.logaddexp(-0.7, -0.5)
    emit_t = [a for a in trop.arcs[trop.start] if a.ilabel == 1][0]
    emit_l = [a for a in logf.arcs[logf.start] if a.ilabel == 1][0]
    np.testing.assert_allclose(emit_t.weight, w_best + (-0.1), atol=1e-6)
    np.testing.assert_allclose(emit_l.weight, float(w_sum) + (-0.1), atol=1e-6)
    # finals fold the same way (start eps-reaches final c)
    np.testing.assert_allclose(trop.finals[trop.start], w_best - 0.05,
                               atol=1e-6)
    np.testing.assert_allclose(logf.finals[logf.start], float(w_sum) - 0.05,
                               atol=1e-6)
    with pytest.raises(ValueError, match="semiring"):
        f.remove_input_epsilons("viterbi")


# ---------------------------------------------------------------------------
# determinize / push_weights / minimize (OpenFst fstdeterminize/fstpush/
# fstminimize parity for the graph-build slice)
# ---------------------------------------------------------------------------


def _language(fst, max_len=6):
    """Best path weight per ilabel string (paths up to max_len arcs)."""
    out = {}
    if fst.start < 0:
        return out
    frontier = [(fst.start, (), 0.0)]
    for _ in range(max_len + 1):
        nxt = []
        for s, lab, w in frontier:
            fw = fst.finals.get(s)
            if fw is not None:
                key = lab
                cand = w + fw
                if key not in out or cand > out[key]:
                    out[key] = cand
            for a in fst.arcs[s]:
                if len(lab) < max_len:
                    nxt.append((a.nextstate, lab + (a.ilabel,), w + a.weight))
        frontier = nxt
    return out


def _lang_close(la, lb, tol=1e-4):
    assert set(la) == set(lb), (set(la) ^ set(lb))
    for k in la:
        assert abs(la[k] - lb[k]) < tol, (k, la[k], lb[k])


def _is_deterministic(fst):
    for s in range(fst.num_states):
        labs = [a.ilabel for a in fst.arcs[s]]
        if len(labs) != len(set(labs)):
            return False
    return True


def _nondet_acceptor():
    """Two overlapping paths for 'ab', one for 'ac' — nondeterministic at start."""
    f = Fst()
    for _ in range(5):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 1, -0.5, 1)
    f.add_arc(0, 1, 1, -1.0, 2)   # same label, different weight/destination
    f.add_arc(1, 2, 2, -0.25, 3)
    f.add_arc(2, 2, 2, -0.1, 3)
    f.add_arc(2, 3, 3, -0.2, 4)
    f.set_final(3, -0.3)
    f.set_final(4, 0.0)
    return f


def test_determinize_acceptor_language_preserved():
    f = _nondet_acceptor()
    d = f.determinize()
    assert _is_deterministic(d)
    _lang_close(_language(f), _language(d))


def test_determinize_cyclic_acceptor():
    # cyclic but determinizable (twins property: same-label cycles carry the
    # same weight); nondeterministic entry into the loops
    f = Fst()
    for _ in range(3):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 1, -0.5, 1)
    f.add_arc(0, 1, 1, -0.7, 2)
    f.add_arc(1, 2, 2, -0.3, 1)   # cycle
    f.add_arc(2, 2, 2, -0.3, 2)   # cycle, same weight
    f.set_final(1, 0.0)
    f.set_final(2, -0.1)
    d = f.determinize()
    assert _is_deterministic(d)
    _lang_close(_language(f, max_len=5), _language(d, max_len=5))


def test_determinize_nondeterminizable_raises():
    # two same-label cycles with DIFFERENT weights: residuals diverge — the
    # classic tropical-non-determinizable case must trip the guard, not hang
    f = Fst()
    for _ in range(3):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 1, -0.5, 1)
    f.add_arc(0, 1, 1, -0.7, 2)
    f.add_arc(1, 2, 2, -0.2, 1)
    f.add_arc(2, 2, 2, -0.4, 2)
    f.set_final(1, 0.0)
    f.set_final(2, -0.1)
    with pytest.raises(ValueError):
        f.determinize(max_states=5000)


def test_determinize_transducer_needs_encoding():
    f = Fst()
    for _ in range(2):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 7, -0.5, 1)   # ilabel != olabel
    f.set_final(1, 0.0)
    with pytest.raises(ValueError):
        f.determinize()
    d = f.determinize(encode_labels=True)
    assert d.num_arcs == 1 and d.arcs[d.start][0].olabel == 7


def test_determinize_rejects_epsilons():
    f = Fst()
    for _ in range(2):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, EPS, EPS, -0.5, 1)
    f.set_final(1, 0.0)
    with pytest.raises(ValueError):
        f.determinize()


def test_push_weights_preserves_language_with_start_loop():
    # word-loop-like: final loops back to start, so start is revisited
    f = Fst()
    for _ in range(3):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 1, -0.5, 1)
    f.add_arc(1, 2, 2, -1.5, 2)
    f.add_arc(2, 3, 3, -0.25, 0)  # back to start
    f.set_final(2, -0.75)
    p = f.push_weights()
    _lang_close(_language(f, max_len=7), _language(p, max_len=7))
    # pushed: all non-start states' best suffix weight is 0
    # (spot-check: arcs out of state 1 now carry the full remaining weight)


def test_minimize_merges_equivalent_suffixes():
    # two prefixes sharing an identical weighted suffix, built twice
    f = Fst()
    for _ in range(7):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 1, -0.5, 1)
    f.add_arc(0, 2, 2, -0.5, 2)
    # suffix copy A from state 1
    f.add_arc(1, 5, 5, -0.1, 3)
    f.add_arc(3, 6, 6, -0.2, 4)
    f.set_final(4, 0.0)
    # suffix copy B from state 2 (same labels/weights, distinct states)
    f.add_arc(2, 5, 5, -0.1, 5)
    f.add_arc(5, 6, 6, -0.2, 6)
    f.set_final(6, 0.0)
    m = f.minimize()
    assert m.num_states < f.num_states
    _lang_close(_language(f), _language(m))
    assert _is_deterministic(m)


def test_minimize_weight_differences_block_merge_until_pushed():
    # same suffix labels but weight split differently across arcs: pushing
    # canonicalizes, so minimize() must still merge them
    f = Fst()
    for _ in range(7):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, 1, 1, -0.5, 1)
    f.add_arc(0, 2, 2, -0.5, 2)
    f.add_arc(1, 5, 5, -0.3, 3)      # -0.3 then 0.0
    f.add_arc(3, 6, 6, 0.0, 4)
    f.set_final(4, 0.0)
    f.add_arc(2, 5, 5, 0.0, 5)       # 0.0 then -0.3 — same total
    f.add_arc(5, 6, 6, -0.3, 6)
    f.set_final(6, 0.0)
    m = f.minimize()
    _lang_close(_language(f), _language(m))
    assert m.num_states <= 4


def test_determinize_then_minimize_word_graph():
    # end-to-end: lexicon-ish nondeterministic acceptor → det → min
    rng = np.random.RandomState(0)
    f = Fst()
    root = f.add_state()
    f.set_start(root)
    words = [(1, 2), (1, 3), (1, 2, 3), (2, 3), (2, 3)]
    for w in words:
        cur = root
        for lab in w:
            nxt = f.add_state()
            f.add_arc(cur, lab, lab, float(-rng.rand() * 0.5), nxt)
            cur = nxt
        f.set_final(cur, 0.0)
    d = f.determinize()
    m = d.minimize()
    assert _is_deterministic(m)
    assert m.num_states <= d.num_states <= f.num_states
    _lang_close(_language(f), _language(m))
