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
