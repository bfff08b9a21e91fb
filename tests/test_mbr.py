"""MBR / consensus decoding (Kaldi lattice-mbr-decode, sausages.cc) and
lattice posterior pruning (lattice-prune) — brute-force verified."""

import io
import itertools

import numpy as np
import pytest

from pykaldi2_tpu.decode.mbr import (MbrResult, arc_log_posteriors,
                                     lattice_word_fst_timed, mbr_decode,
                                     prune_posterior, write_ctm)
from pykaldi2_tpu.graph.fst import EPS, Fst

A, B, C, D = 1, 2, 3, 4


def _edit_distance(a, b):
    d = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, len(b) + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 1))
    return int(d[-1])


def _enum_paths(f):
    """All (word_seq, log_prob) complete paths of a small acyclic FST."""
    out = []

    def walk(s, words, w):
        if s in f.finals:
            out.append((tuple(words), w + f.finals[s]))
        for a in f.arcs[s]:
            walk(a.nextstate,
                 words + ([a.ilabel] if a.ilabel != EPS else []), w + a.weight)

    walk(f.start, [], 0.0)
    return out


def _expected_errors(f, hyp):
    paths = _enum_paths(f)
    logz = np.logaddexp.reduce([w for _, w in paths])
    return sum(np.exp(w - logz) * _edit_distance(hyp, ws) for ws, w in paths)


def _abc_lattice():
    """Paths: 'a b' p=.3, 'a c' p=.3, 'd' p=.4 — MAP='d', MBR='a'."""
    f = Fst()
    for _ in range(5):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, A, A, np.log(0.6), 1)
    f.add_arc(1, B, B, np.log(0.5), 2)
    f.add_arc(1, C, C, np.log(0.5), 3)
    f.add_arc(0, D, D, np.log(0.4), 4)
    for s in (2, 3, 4):
        f.set_final(s, 0.0)
    return f


def test_mbr_beats_map_and_matches_brute_force():
    f = _abc_lattice()
    res = mbr_decode(f)
    # brute force: the consensus must minimize expected WER over all
    # candidate hypotheses up to length 2, and report that exact risk
    # (path suffixes here are disjoint, so the recursion is exact).
    # [A] and [A, D] tie at risk 1.0; the bin argmax picks [A, D].
    risks = {}
    for n in range(3):
        for hyp in itertools.product([A, B, C, D], repeat=n):
            risks[hyp] = _expected_errors(f, list(hyp))
    assert res.bayes_risk == pytest.approx(min(risks.values()), abs=1e-9)
    assert res.bayes_risk == pytest.approx(
        _expected_errors(f, res.words), abs=1e-9)
    assert risks[(D,)] > res.bayes_risk  # the MAP hypothesis is worse


def test_mbr_confidences_and_bins():
    res = mbr_decode(_abc_lattice())
    # consensus [A, D]: A with 0.6 mass, D with 0.4 (B/C split 0.3/0.3)
    assert res.words == [A, D]
    assert res.confidences == pytest.approx([0.6, 0.4], abs=1e-9)
    for bin_ in res.bins:
        if bin_:
            assert sum(bin_.values()) == pytest.approx(1.0, abs=1e-9)
    a_bin = [b for b in res.bins if b.get(A)][0]
    assert a_bin[EPS] == pytest.approx(0.4, abs=1e-9)  # the 'd' path skips A
    d_bin = [b for b in res.bins if b.get(D)][0]
    assert d_bin == pytest.approx({B: 0.3, C: 0.3, D: 0.4}, abs=1e-9)


def test_mbr_unambiguous_lattice_is_exact():
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, A, A, -0.5, 1)
    f.add_arc(1, B, B, -0.5, 2)
    f.add_arc(2, C, C, -0.5, 3)
    f.set_final(3, 0.0)
    res = mbr_decode(f)
    assert res.words == [A, B, C]
    assert res.bayes_risk == pytest.approx(0.0, abs=1e-9)
    assert res.confidences == pytest.approx([1.0, 1.0, 1.0], abs=1e-9)


def test_mbr_eps_arcs_and_times():
    # a -> (eps silence) -> b, with explicit frame times on every arc
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, A, A, 0.0, 1)
    f.add_arc(1, EPS, EPS, 0.0, 2)
    f.add_arc(2, B, B, 0.0, 3)
    f.set_final(3, 0.0)
    times = [[(0.0, 10.0)], [(10.0, 14.0)], [(14.0, 30.0)], []]
    res = mbr_decode(f, arc_times=times)
    assert res.words == [A, B]
    (b1, e1), (b2, e2) = res.times
    assert (b1, e1) == pytest.approx((0.0, 10.0), abs=1e-6)
    assert (b2, e2) == pytest.approx((14.0, 30.0), abs=1e-6)
    assert b1 <= b2  # CTM monotonicity
    out = io.StringIO()
    write_ctm(out, "utt1", res, id2w={A: "a", B: "b"})
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[:5] == ["utt1", "1", "0.000", "0.100", "a"]


def test_mbr_iterates_away_from_initial_best_path():
    # 60% of mass says 'a b', 40% 'c' — best path 'c' only if per-path,
    # but split 'a b'/'a x' paths: MAP='c' (0.4 > 0.3), consensus='a b'
    f = Fst()
    for _ in range(6):
        f.add_state()
    f.set_start(0)
    f.add_arc(0, A, A, np.log(0.6), 1)
    f.add_arc(1, B, B, np.log(0.5), 2)
    f.add_arc(1, B, B, np.log(0.5), 3)  # same word, different state
    f.add_arc(0, C, C, np.log(0.4), 4)
    for s in (2, 3, 4):
        f.set_final(s, 0.0)
    res = mbr_decode(f)
    assert res.words == [A, B]
    assert res.bayes_risk == pytest.approx(
        _expected_errors(f, [A, B]), abs=1e-9)


def test_arc_posteriors():
    f = _abc_lattice()
    post, logz = arc_log_posteriors(f)
    assert logz == pytest.approx(0.0, abs=1e-9)
    assert np.exp(post[0]) == pytest.approx([0.6, 0.4], abs=1e-9)  # a, d
    assert np.exp(post[1]) == pytest.approx([0.3, 0.3], abs=1e-9)  # b, c


def test_prune_posterior():
    f = _abc_lattice()
    # best path 'd' has logp -0.916; 'a b'/'a c' are at -1.204
    tight = prune_posterior(f, beam=0.1)
    assert sorted(ws for ws, _ in _enum_paths(tight)) == [(D,)]
    loose = prune_posterior(f, beam=10.0)
    assert sorted(ws for ws, _ in _enum_paths(loose)) == \
        sorted(ws for ws, _ in _enum_paths(f))


def test_mbr_on_decoded_lattice():
    """Consensus from a real native-decoder lattice: agrees with best path
    on a near-unambiguous task, with monotonic CTM times over [0, T]."""
    from pykaldi2_tpu.decode import LatticeDecoder
    from pykaldi2_tpu.graph import (HmmTopology, TransitionModel,
                                    make_decode_graph)

    tm = TransitionModel(HmmTopology.one_state(range(1, 5)))
    lexicon = {"wa": [[1]], "wb": [[2, 3]], "wc": [[4]]}
    word_ids = {"wa": 1, "wb": 2, "wc": 3}
    g = make_decode_graph(tm, lexicon, word_ids)
    dec = LatticeDecoder(g, beam=32.0, lattice_beam=20.0)
    seq = [0, 1, 2, 2, 3]
    T = len(seq)
    obs = np.full((T, tm.num_pdfs), -6.0, np.float32)
    for t, p in enumerate(seq):
        obs[t, p] = 0.0
    lat, frames, _best = dec.decode_lattice(obs, with_frames=True)
    wf, times = lattice_word_fst_timed(lat, loglikes=obs, frames=frames)
    res = mbr_decode(wf, arc_times=times)
    assert res.words == [1, 2, 3]  # wa wb wc
    assert all(c > 0.5 for c in res.confidences)
    begins = [b for b, _ in res.times]
    assert begins == sorted(begins)
    assert all(0.0 <= b <= e <= T for b, e in res.times)


def test_lattice_tool_cli_mbr_prune(tmp_path):
    from pykaldi2_tpu.bin.lattice_tool import main as lt_main
    from pykaldi2_tpu.decode.lattice import write_lattices_text

    lat_path = str(tmp_path / "lat.txt")
    write_lattices_text(lat_path, {"u1": _abc_lattice()})
    words = str(tmp_path / "words.txt")
    with open(words, "w") as f:
        f.write("<eps> 0\na 1\nb 2\nc 3\nd 4\n")
    hyp = str(tmp_path / "hyp.txt")
    ctm = str(tmp_path / "out.ctm")
    rc = lt_main(["-lattices", lat_path, "-words", words, "-best_path", hyp,
                  "-mbr", "-ctm_out", ctm])
    assert rc == 0
    assert open(hyp).read().split() == ["u1", "a", "d"]
    ctm_lines = open(ctm).read().strip().splitlines()
    assert len(ctm_lines) == 2
    assert float(ctm_lines[0].split()[5]) == pytest.approx(0.6, abs=1e-3)

    # posterior pruning to a tight beam leaves only the best path ('d')
    pruned = str(tmp_path / "pruned.txt")
    rc = lt_main(["-lattices", lat_path, "-words", words, "-best_path", hyp,
                  "-prune_beam", "0.1", "-pruned_out", pruned])
    assert rc == 0
    assert open(hyp).read().split() == ["u1", "d"]
    from pykaldi2_tpu.decode.lattice import read_lattices_text

    assert sorted(ws for ws, _ in _enum_paths(read_lattices_text(pruned)["u1"])) \
        == [(4,)]


def test_lattice_word_fst_timed_roundtrip():
    """Times from a real decoder lattice flow through to the CTM."""
    from pykaldi2_tpu.ops.fsa import DenseFsa

    # hand-built time-synchronous lattice: states at frames 0,1,2
    lat = DenseFsa(
        num_states=3,
        start=0,
        src=np.array([0, 1]),
        dst=np.array([1, 2]),
        pdf=np.array([0, 0]),
        weight=np.array([-1.0, -1.0]),
        final=np.array([-np.inf, -np.inf, 0.0]),
        olabel=np.array([A, B]),
    )
    loglikes = np.zeros((3, 1), np.float32)
    frames = np.array([0, 1, 2])
    wf, times = lattice_word_fst_timed(lat, loglikes, frames)
    res = mbr_decode(wf, arc_times=times)
    assert res.words == [A, B]
    assert res.times[0] == pytest.approx((0.0, 1.0))
    assert res.times[1] == pytest.approx((1.0, 2.0))


@pytest.mark.slow
def test_mbr_wer_at_scale_noisy():
    """Consensus decoding under genuinely uncertain acoustics at word-LM
    scale (held-out sentences, weak noisy acoustics, real decoded
    lattices).  The hard guarantee checked per lattice: the consensus has
    expected edit distance <= the best path UNDER THE LATTICE POSTERIOR
    (the measure MBR minimizes).  Corpus WER against the true reference is
    model-mismatch territory, so it only gets a loose sanity bound
    (test_arpa's _sentences uses Python's per-process-randomized hash(),
    making exact corpus WER non-deterministic across processes)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_arpa import _obs_for_words, _sentences, _toy_system

    from pykaldi2_tpu.decode import LatticeDecoder, edit_distance
    from pykaldi2_tpu.decode.lattice import best_path, lattice_word_fst
    from pykaldi2_tpu.decode.mbr import (expected_edit_distance,
                                         lattice_word_fst_timed, mbr_decode)
    from pykaldi2_tpu.graph.arpa import train_arpa
    from pykaldi2_tpu.graph.compile import make_word_decode_graph

    rng = np.random.RandomState(23)
    tm, vocab, word_ids, lexicon = _toy_system(
        rng, n_phones=20, n_words=300, pron_len=(3, 6))
    sents = _sentences(rng, vocab, n=400, lo=3, hi=7)
    model = train_arpa(sents[:350], order=3)  # eval sentences held out
    hclg = make_word_decode_graph(tm, lexicon, word_ids, model)
    dec = LatticeDecoder(hclg, beam=14.0, max_active=2000, lattice_beam=7.0)

    bp_errs = mbr_errs = total = 0
    n_decoded = 0
    r2 = np.random.RandomState(99)
    for i in range(350, 375):
        ref = sents[i][:5]
        # weak signal + noise: lattices carry real competing hypotheses
        obs = _obs_for_words(tm, lexicon, ref, r2, strength=1.4)
        obs += r2.randn(*obs.shape).astype(np.float32) * 1.4
        try:
            lat, frames, _sc = dec.decode_lattice(obs, with_frames=True)
        except RuntimeError:
            continue
        n_decoded += 1
        ref_ids = [word_ids[w] for w in ref]
        bp_words, _ = best_path(lattice_word_fst(lat, loglikes=obs,
                                                 frames=frames))
        twf, times = lattice_word_fst_timed(lat, loglikes=obs, frames=frames)
        res = mbr_decode(twf, arc_times=times)
        bp_errs += edit_distance(ref_ids, bp_words)["errors"]
        mbr_errs += edit_distance(ref_ids, res.words)["errors"]
        total += len(ref_ids)
        # the MBR property, per lattice: iterating from the best path must
        # not increase the expected edit distance — compare on the SAME
        # (timed, eps-bearing) fst the consensus was derived from, since
        # the recursion's estimate depends on the lattice representation
        risk_bp = expected_edit_distance(twf, bp_words)
        assert res.bayes_risk <= risk_bp + 1e-6, (res.bayes_risk, risk_bp)
        # CTM sanity on real lattices: monotone times
        begins = [b for b, _ in res.times]
        assert begins == sorted(begins)
    assert n_decoded >= 20
    bp_wer, mbr_wer = bp_errs / total, mbr_errs / total
    assert 0.1 < bp_wer < 1.5          # noise makes real errors
    assert mbr_wer <= bp_wer + 0.1     # loose: corpus WER is mismatch-noisy
