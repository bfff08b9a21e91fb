"""Lattice post-processing: N-best, oracle WER, lmrescore, Kaldi text IO.

Mirrors the Kaldi lattice-* CLI behaviors the reference eval pipeline uses
(SURVEY.md §3.2 "Kaldi lattice functions", §4.4).
"""

import numpy as np
import pytest

from pykaldi2_tpu.decode.lattice import (
    best_path,
    lattice_word_fst,
    lmrescore,
    nbest,
    oracle_errors,
    read_lattices_text,
    write_lattices_text,
)
from pykaldi2_tpu.graph.fst import EPS, Fst
from pykaldi2_tpu.ops.fsa import DenseFsa


def _word_fst(paths):
    """Acceptor with the given [(words, weight)] paths (may share nothing)."""
    f = Fst()
    root = f.add_state()
    f.set_start(root)
    for words, w in paths:
        cur = root
        for i, lab in enumerate(words):
            nxt = f.add_state()
            f.add_arc(cur, lab, lab, w if i == 0 else 0.0, nxt)
            cur = nxt
        f.set_final(cur, 0.0)
    return f


def test_nbest_orders_and_dedups():
    f = _word_fst([
        ((1, 2), -1.0),
        ((1, 3), -0.5),
        ((1, 2), -2.0),   # duplicate word sequence, worse score
        ((4,), -3.0),
    ])
    top = nbest(f, 10)
    seqs = [tuple(w) for w, _ in top]
    assert seqs == [(1, 3), (1, 2), (4,)]          # unique, best first
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True)
    np.testing.assert_allclose(scores, [-0.5, -1.0, -3.0], atol=1e-6)

    # non-unique keeps the duplicate path
    top_dup = nbest(f, 10, unique=False)
    assert [tuple(w) for w, _ in top_dup] == [(1, 3), (1, 2), (1, 2), (4,)]


def test_best_path():
    f = _word_fst([((1, 2), -1.0), ((3,), -0.25)])
    words, score = best_path(f)
    assert words == [3]
    assert abs(score + 0.25) < 1e-6


def test_oracle_errors():
    f = _word_fst([((1, 2, 3), -1.0), ((1, 4), -0.1)])
    assert oracle_errors(f, [1, 2, 3]) == 0     # exact path exists
    assert oracle_errors(f, [1, 2, 5]) == 1     # one substitution
    assert oracle_errors(f, [1]) == 1           # best: delete nothing, 1 ins? (1,4): one insertion
    assert oracle_errors(f, [6, 7, 8, 9]) == 4  # all wrong + length


def test_oracle_beats_best_path():
    # best path is wrong, but the oracle path is in the lattice
    f = _word_fst([((1, 2), 0.0), ((3, 4), -5.0)])
    words, _ = best_path(f)
    assert words == [1, 2]
    assert oracle_errors(f, [3, 4]) == 0


def test_lattice_word_fst_folds_acoustics():
    # two frames, two pdfs; two lattice paths emitting different pdfs
    lat = DenseFsa(
        num_states=4,
        src=np.array([0, 0, 1, 2], np.int32),
        dst=np.array([1, 2, 3, 3], np.int32),
        pdf=np.array([0, 1, 0, 1], np.int32),
        weight=np.array([-0.5, -0.5, 0.0, 0.0], np.float32),
        final=np.array([-np.inf, -np.inf, -np.inf, 0.0], np.float32),
        olabel=np.array([7, 8, 0, 0], np.int32),
    )
    frames = np.array([0, 1, 1, 2], np.int32)
    ll = np.array([[0.0, -10.0], [-1.0, -2.0], [0.0, 0.0]], np.float32)
    f = lattice_word_fst(lat, loglikes=ll, frames=frames, acoustic_scale=1.0)
    top = nbest(f, 2)
    # path via word 7: -0.5 + ll[0,0] + 0 + ll[1,0] = -1.5
    # path via word 8: -0.5 + ll[0,1] + 0 + ll[1,1] = -12.5
    assert [tuple(w) for w, _ in top] == [(7,), (8,)]
    np.testing.assert_allclose([s for _, s in top], [-1.5, -12.5], atol=1e-5)


def test_lattice_text_roundtrip(tmp_path):
    f1 = _word_fst([((1, 2), -1.0), ((3,), -0.25)])
    f2 = _word_fst([((5,), -0.5)])
    path = str(tmp_path / "lat.txt")
    write_lattices_text(path, {"utt1": f1, "utt2": f2})
    back = read_lattices_text(path)
    assert set(back) == {"utt1", "utt2"}
    for orig, name in [(f1, "utt1"), (f2, "utt2")]:
        a = {tuple(w): s for w, s in nbest(orig, 10)}
        b = {tuple(w): s for w, s in nbest(back[name], 10)}
        assert set(a) == set(b)
        for k in a:
            assert abs(a[k] - b[k]) < 1e-5


def test_lmrescore_swaps_lm_scores():
    # unigram "LMs" without backoff: old scores word 1 at -1, word 2 at -2;
    # new LM flips the preference
    def unigram(scores):
        g = Fst()
        s = g.add_state()
        g.set_start(s)
        g.set_final(s, 0.0)
        for w, sc in scores.items():
            g.add_arc(s, w, w, sc, s)
        return g

    g_old = unigram({1: -1.0, 2: -2.0})
    g_new = unigram({1: -3.0, 2: -0.5})
    # acoustics: both words equally likely; lattice scores include old LM
    f = _word_fst([((1,), -1.0), ((2,), -2.0)])
    words, _ = best_path(f)
    assert words == [1]
    r = lmrescore(f, g_old, g_new)
    words2, score2 = best_path(r)
    assert words2 == [2]
    assert abs(score2 + 0.5) < 1e-6  # acoustic 0 + new LM −0.5

    # lm_scale applies to the new LM only
    r2 = lmrescore(f, g_old, g_new, lm_scale=2.0)
    _, score3 = best_path(r2)
    assert abs(score3 + 1.0) < 1e-6


def test_decoded_lattice_best_path_matches_decoder():
    """End-to-end: native decoder lattice → word FST → best_path equals the
    decoder's own one-best, and N-best scores are consistent."""
    from pykaldi2_tpu.decode import LatticeDecoder
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_decode_graph

    tm = TransitionModel(HmmTopology.one_state(range(1, 5)))
    lexicon = {"wa": [[1]], "wb": [[2, 3]], "wc": [[4]]}
    word_ids = {"wa": 1, "wb": 2, "wc": 3}
    g = make_decode_graph(tm, lexicon, word_ids, sil_prob=0.0)
    dec = LatticeDecoder(g, beam=32.0, lattice_beam=20.0)
    rng = np.random.RandomState(1)
    obs = (rng.randn(7, tm.num_pdfs) * 2).astype(np.float32)

    words_ref, _pdfs, score_ref = dec.decode(obs)
    lat, frames, _ = dec.decode_lattice(obs, with_frames=True)
    wf = lattice_word_fst(lat, loglikes=obs, frames=frames)
    words, score = best_path(wf)
    assert words == words_ref
    assert abs(score - score_ref) < 1e-3

    top = nbest(wf, 5)
    assert tuple(top[0][0]) == tuple(words_ref)
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True)
    # oracle over the lattice can't be worse than the 1-best's distance
    assert oracle_errors(wf, words_ref) == 0


def test_lattice_tool_cli(tmp_path):
    from pykaldi2_tpu.bin.lattice_tool import main as lt_main

    f1 = _word_fst([((1, 2), -1.0), ((3,), -0.25)])
    lat_path = str(tmp_path / "lat.txt")
    write_lattices_text(lat_path, {"u1": f1})
    words = str(tmp_path / "words.txt")
    with open(words, "w") as f:
        f.write("<eps> 0\nalpha 1\nbeta 2\ngamma 3\n")
    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as f:
        f.write("u1 alpha beta\n")
    hyp = str(tmp_path / "hyp.txt")
    nb = str(tmp_path / "nb.txt")
    rc = lt_main(["-lattices", lat_path, "-words", words, "-best_path", hyp,
                  "-nbest", "5", "-nbest_out", nb, "-ref", ref])
    assert rc == 0
    assert open(hyp).read().strip() == "u1 gamma"
    lines = open(nb).read().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("u1-1 ")


def test_lattice_binary_ark_roundtrip(tmp_path):
    from pykaldi2_tpu.decode.lattice_ark import read_lattice_ark, write_lattice_ark

    f1 = _word_fst([((1, 2), -1.0), ((3,), -0.25)])
    f2 = _word_fst([((5,), -0.5)])
    path = str(tmp_path / "lat.ark")
    write_lattice_ark(path, {"utt1": f1, "utt2": f2})
    back = read_lattice_ark(path)
    assert set(back) == {"utt1", "utt2"}
    for orig, name in [(f1, "utt1"), (f2, "utt2")]:
        a = {tuple(w): s for w, s in nbest(orig, 10)}
        b = {tuple(w): s for w, s in nbest(back[name], 10)}
        assert set(a) == set(b)
        for k in a:
            assert abs(a[k] - b[k]) < 1e-5


def test_lattice_binary_ark_fixture(tmp_path):
    """Byte-layout freeze: an INDEPENDENT writer for one tiny CompactLattice
    entry (kaldi-lattice.cc WriteCompactLattice layout, with a non-empty
    transition-id string) must parse, and the tid string is dropped."""
    import io as _io
    import struct as _s

    buf = _io.BytesIO()
    buf.write(b"u1 \x00B")
    buf.write(_s.pack("<i", 2125659606))
    for tok in ("vector", "compactlattice44"):
        buf.write(_s.pack("<i", len(tok)) + tok.encode())
    buf.write(_s.pack("<ii", 2, 0))
    buf.write(_s.pack("<Q", 0))
    buf.write(_s.pack("<qqq", 0, 2, 1))
    # state 0: non-final, one arc word 7 with costs (0.5 graph, 1.25 acoustic)
    # and tid string [3, 4]
    buf.write(_s.pack("<ff", float("inf"), float("inf")))
    buf.write(_s.pack("<i", 0))
    buf.write(_s.pack("<q", 1))
    buf.write(_s.pack("<ii", 7, 7))
    buf.write(_s.pack("<ff", 0.5, 1.25))
    buf.write(_s.pack("<i", 2) + _s.pack("<ii", 3, 4))
    buf.write(_s.pack("<i", 1))
    # state 1: final (0.25, 0), no arcs
    buf.write(_s.pack("<ff", 0.25, 0.0))
    buf.write(_s.pack("<i", 0))
    buf.write(_s.pack("<q", 0))

    import hashlib
    digest = hashlib.sha256(buf.getvalue()).hexdigest()

    path = str(tmp_path / "fx.ark")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    from pykaldi2_tpu.decode.lattice_ark import read_lattice_ark

    lats = read_lattice_ark(path)
    lat = lats["u1"]
    assert lat.num_states == 2 and lat.start == 0
    assert lat.finals == {1: -0.25}
    (a,) = lat.arcs[0]
    assert (a.ilabel, a.olabel, a.nextstate) == (7, 7, 1)
    assert abs(a.weight + 1.75) < 1e-6  # graph+acoustic summed


def test_lmrescore_with_backoff_eps_is_nbest_safe():
    """ARPA-backoff G arcs are eps-labeled; lmrescore output must stay
    epsilon-free so unique N-best keeps working (ADVICE r2 item 1)."""
    f = _word_fst([((1, 2), -1.0)])
    # G with a backoff-style eps arc: after word 1 (bigram state), word 2 is
    # reachable only by backing off (eps) to the unigram state
    g = Fst()
    uni = g.add_state()
    big = g.add_state()
    g.set_start(uni)
    g.add_arc(uni, 1, 1, -0.5, big)        # P(1)
    g.add_arc(big, EPS, EPS, -0.3, uni)    # backoff(1)
    g.add_arc(uni, 2, 2, -0.7, uni)        # P(2 | backoff)
    g.set_final(uni, 0.0)
    r = lmrescore(f, None, g)
    for s in range(r.num_states):
        for a in r.arcs[s]:
            assert a.ilabel != EPS, "lmrescore output must be epsilon-free"
    top = nbest(r, 5)   # must not raise 'needs an epsilon-free acceptor'
    assert [tuple(w) for w, _ in top] == [(1, 2)]
    np.testing.assert_allclose(top[0][1], -1.0 - 0.5 - 0.3 - 0.7, atol=1e-6)


def test_read_lattices_text_weightless_arc_lines(tmp_path):
    """'src dst word' (weight omitted = Weight::One) is a legal OpenFst/Kaldi
    text arc; it must parse as an arc, not corrupt into a final state
    (ADVICE r2 item 2)."""
    path = str(tmp_path / "lat.txt")
    with open(path, "w") as f:
        f.write("utt1\n")
        f.write("0 1 5\n")            # arc, weight omitted
        f.write("1 2 6 1.5,0.5,\n")   # arc with graph,acoustic weight
        f.write("2\n")                # final, weight omitted
        f.write("\n")
    lat = read_lattices_text(path)["utt1"]
    assert lat.start == 0
    assert len(lat.arcs[0]) == 1
    a = lat.arcs[0][0]
    assert (a.ilabel, a.nextstate, a.weight) == (5, 1, 0.0)
    assert 0 not in lat.finals          # state 0 must NOT become final
    assert lat.finals[2] == 0.0
    words, score = best_path(lat)
    assert words == [5, 6]
    np.testing.assert_allclose(score, -2.0, atol=1e-6)
