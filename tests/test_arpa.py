"""ARPA LM reader/trainer + vectorized FST layer + word-LM decode graphs.

Covers VERDICT round-1 item 2: ARPA n-gram → backoff G FST, numpy arc-table
composition parity with the object-graph reference composition, vectorized
HMM expansion equivalence, and an end-to-end WER run against a trigram LM
over a 1k+-word vocabulary (reference eval decodes against HCLG with a real
word LM — SURVEY.md §4.4).
"""

from __future__ import annotations

import math
import time

import numpy as np
import pytest

from pykaldi2_tpu.graph.arpa import (
    BOS, EOS, ArpaModel, arpa_to_fst, read_arpa, train_arpa, write_arpa,
)
from pykaldi2_tpu.graph.compile import (
    expand_to_pdf_vfst, make_decode_graph, make_lexicon_trie_fst,
    make_word_decode_graph,
)
from pykaldi2_tpu.graph.fst import EPS, Fst
from pykaldi2_tpu.graph.topology import HmmTopology
from pykaldi2_tpu.graph.transition_model import TransitionModel
from pykaldi2_tpu.graph.vfst import VectorFst
from pykaldi2_tpu.decode.decoder import LatticeDecoder
from pykaldi2_tpu.decode.wer import edit_distance


def _sentences(rng, vocab, n=200, lo=3, hi=9):
    # Markov-ish text so the trigram LM has structure
    out = []
    for _ in range(n):
        length = rng.randint(lo, hi)
        s = [vocab[rng.randint(len(vocab))]]
        for _ in range(length - 1):
            prev = hash(s[-1]) % len(vocab)
            nxt = (prev + rng.randint(3)) % len(vocab)
            s.append(vocab[nxt])
        out.append(s)
    return out


def test_train_arpa_normalizes_and_roundtrips(tmp_path):
    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(30)]
    sents = _sentences(rng, vocab, n=100)
    model = train_arpa(sents, order=3)

    # backoff distribution must normalize for several histories
    for hist in [(), ("w1",), ("w1", "w2"), (BOS,), ("w4", "w4")]:
        total = sum(math.exp(model.logp(hist + (w,))) for w in vocab)
        total += math.exp(model.logp(hist + (EOS,)))
        assert total == pytest.approx(1.0, abs=2e-3), f"hist={hist} sums {total}"

    p = tmp_path / "lm.arpa"
    write_arpa(model, str(p))
    model2 = read_arpa(str(p))
    assert model2.order == 3
    for ng in [("w1",), ("w1", "w2"), ("w3", "w1", "w2"), (BOS, "w5")]:
        assert model2.logp(ng) == pytest.approx(model.logp(ng), abs=2e-5)


def test_arpa_fst_scores_match_model():
    """A sentence's best path through G == the best backoff route through the
    model tables. (The eps-backoff FST takes max over routes — the standard
    arpa2fst semantics — so the reference DP allows backing off anytime, and
    the exact canonical backoff score is a lower bound.)"""
    rng = np.random.RandomState(1)
    vocab = [f"w{i}" for i in range(20)]
    word_ids = {w: i + 1 for i, w in enumerate(vocab)}
    model = train_arpa(_sentences(rng, vocab, n=60), order=3)
    g = arpa_to_fst(model, word_ids)

    for trial in range(8):
        length = rng.randint(1, 6)
        sent = [vocab[rng.randint(len(vocab))] for _ in range(length)]
        canonical = 0.0
        ctx = (BOS,)
        for w in sent:
            canonical += model.logp(ctx + (w,))
            ctx = (ctx + (w,))[-(model.order - 1):]
        canonical += model.logp(ctx + (EOS,))

        want = _model_best_path(model, sent)
        got = _acceptor_best_path(g, [word_ids[w] for w in sent])
        assert got == pytest.approx(want, abs=1e-4), f"sent={sent}"
        assert got >= canonical - 1e-4


def _model_best_path(model: ArpaModel, sent):
    """Max-over-backoff-routes DP straight over the ARPA tables (independent
    of the FST construction)."""
    NEG = -1e30

    def exists(h):
        return not h or (len(h) <= model.order - 1 and h in model.ngrams[len(h)])

    def bow(h):
        ent = model.ngrams[len(h)].get(h) if h else None
        return ent[1] if ent is not None else 0.0

    def dest(full):
        h = full[-(model.order - 1):] if model.order > 1 else ()
        while h and not exists(h):
            h = h[1:]
        return h

    # state set: all histories reachable; DP over sentence positions
    cur = {(BOS,) if exists((BOS,)) else (): 0.0}
    for w in sent:
        # backoff closure
        closed = dict(cur)
        frontier = list(cur.items())
        while frontier:
            h, sc = frontier.pop()
            if not h:
                continue
            nh = h[1:]
            while nh and not exists(nh):
                nh = nh[1:]
            nsc = sc + bow(h)
            if nsc > closed.get(nh, NEG):
                closed[nh] = nsc
                frontier.append((nh, nsc))
        nxt = {}
        for h, sc in closed.items():
            ng = h + (w,)
            ent = model.ngrams[len(ng)].get(ng) if len(ng) <= model.order else None
            if ent is not None:
                d = dest(ng)
                cand = sc + ent[0]
                if cand > nxt.get(d, NEG):
                    nxt[d] = cand
        cur = nxt
        if not cur:
            return NEG
    # final: </s> with backoff closure
    closed = dict(cur)
    frontier = list(cur.items())
    while frontier:
        h, sc = frontier.pop()
        if not h:
            continue
        nh = h[1:]
        while nh and not exists(nh):
            nh = nh[1:]
        nsc = sc + bow(h)
        if nsc > closed.get(nh, NEG):
            closed[nh] = nsc
            frontier.append((nh, nsc))
    best = NEG
    for h, sc in closed.items():
        ng = h + (EOS,)
        ent = model.ngrams[len(ng)].get(ng) if len(ng) <= model.order else None
        if ent is not None:
            best = max(best, sc + ent[0])
    return best


def _acceptor_best_path(g: VectorFst, labels):
    """Max-semiring score of label sequence through an acceptor with eps
    (backoff) arcs — tiny host Viterbi with eps closure."""
    NEG = -1e30
    d = np.full(g.num_states, NEG)
    d[g.start] = 0.0

    def closure(d):
        # relax eps arcs to convergence (acyclic backoff chains: few passes)
        for _ in range(g.num_states):
            nd = d.copy()
            eps = g.ilabel == EPS
            cand = d[g.src[eps]] + g.weight[eps]
            np.maximum.at(nd, g.dst[eps], cand)
            if np.allclose(nd, d):
                return nd
            d = nd
        return d

    d = closure(d)
    for lab in labels:
        nd = np.full(g.num_states, NEG)
        sel = g.ilabel == lab
        cand = d[g.src[sel]] + g.weight[sel]
        np.maximum.at(nd, g.dst[sel], cand)
        d = closure(nd)
    score = d + np.where(np.isfinite(g.final), g.final, NEG)
    return float(score.max())


def test_vector_compose_matches_object_compose():
    """VectorFst.compose == Fst.compose on random machines (same accepted
    weighted language, checked by brute-force path enumeration)."""
    rng = np.random.RandomState(2)
    for trial in range(6):
        f1 = _random_fst(rng, n_states=5, n_arcs=12, n_ilabels=3, n_olabels=3,
                         eps_out=True)
        f2 = _random_fst(rng, n_states=4, n_arcs=10, n_ilabels=3, n_olabels=3,
                         eps_in=True)
        ref = f1.compose(f2)
        got = VectorFst.from_fst(f1).compose(VectorFst.from_fst(f2))
        ref_paths = _path_set(ref, max_len=4)
        got_paths = _path_set(got.to_fst(), max_len=4)
        assert set(ref_paths) == set(got_paths), f"trial {trial}"
        for k in ref_paths:
            assert got_paths[k] == pytest.approx(ref_paths[k], abs=1e-4)


def _random_fst(rng, n_states, n_arcs, n_ilabels, n_olabels,
                eps_in=False, eps_out=False):
    f = Fst()
    for _ in range(n_states):
        f.add_state()
    f.set_start(0)
    f.set_final(n_states - 1, float(rng.randn() * 0.1))
    for _ in range(n_arcs):
        s = rng.randint(n_states)
        d = rng.randint(n_states)
        il = rng.randint(0 if eps_in else 1, n_ilabels + 1)
        ol = rng.randint(0 if eps_out else 1, n_olabels + 1)
        f.add_arc(s, il, ol, float(rng.randn() * 0.3), d)
    return f


def _path_set(f: Fst, max_len=4):
    """(ilabels, olabels) → max path weight, paths up to max_len arcs."""
    out = {}
    if f.start < 0:
        return out
    stack = [(f.start, (), (), 0.0, 0)]
    while stack:
        s, il, ol, w, depth = stack.pop()
        if s in f.finals:
            key = (il, ol)
            cand = w + f.finals[s]
            if key not in out or cand > out[key]:
                out[key] = cand
        if depth == max_len:
            continue
        for a in f.arcs[s]:
            stack.append((a.nextstate,
                          il + ((a.ilabel,) if a.ilabel else ()),
                          ol + ((a.olabel,) if a.olabel else ()),
                          w + a.weight, depth + 1))
    return out


def test_vector_compose_mismatched_label_ranges():
    """Regression (round-2 review): per-side key bases aliased a label >= the
    other side's base into the next state's key range, fabricating arcs.
    Here L emits olabel 4 but G's max ilabel is 3: the composition is EMPTY."""
    L = Fst()
    a, b = L.add_state(), L.add_state()
    L.set_start(a)
    L.add_arc(a, 1, 4, 0.0, b)      # olabel 4
    L.set_final(b, 0.0)
    G = Fst()
    c, d = G.add_state(), G.add_state()
    G.set_start(c)
    G.add_arc(c, 3, 3, 0.0, d)      # max ilabel 3 < 4
    G.set_final(d, 0.0)
    ref = L.compose(G)
    got = VectorFst.from_fst(L).compose(VectorFst.from_fst(G))
    assert ref.num_states == 0 or not ref.finals
    assert got.num_states == 0, f"fabricated {got.num_arcs} arcs"


def test_vector_connect_matches_object_connect():
    rng = np.random.RandomState(3)
    for _ in range(5):
        f = _random_fst(rng, 8, 14, 3, 3)
        a = f.connect()
        b = VectorFst.from_fst(f).connect()
        assert a.num_states == b.num_states
        assert a.num_arcs == b.num_arcs


# ---------------------------------------------------------------------------
# Decode-graph equivalence + end-to-end WER with a trigram LM
# ---------------------------------------------------------------------------


def _toy_system(rng, n_phones=8, n_words=30, pron_len=(2, 5)):
    phones = list(range(1, n_phones + 1))
    tm = TransitionModel(HmmTopology.one_state(phones))
    vocab = [f"word{i}" for i in range(n_words)]
    word_ids = {w: i + 1 for i, w in enumerate(vocab)}
    lexicon = {}
    seen = set()
    for w in vocab:
        while True:
            L = rng.randint(*pron_len)
            pron = tuple(int(rng.choice(phones)) for _ in range(L))
            if pron not in seen:     # unique prons keep best-path unambiguous
                seen.add(pron)
                break
        lexicon[w] = [list(pron)]
    return tm, vocab, word_ids, lexicon


def _obs_for_words(tm, lexicon, words, rng, frames_per_phone=3, strength=8.0):
    pdfs = []
    for w in words:
        for ph in lexicon[w][0]:
            pdf = tm.pdf_for(ph, 0)
            pdfs.extend([pdf] * frames_per_phone)
    T = len(pdfs)
    obs = rng.randn(T, tm.num_pdfs).astype(np.float32) * 0.1
    obs[np.arange(T), pdfs] += strength
    return obs


def test_word_graph_matches_collapsed_graph():
    """Same G → trie+eps HCLG and the collapsed small-graph path must find
    the same words with the same Viterbi score."""
    rng = np.random.RandomState(5)
    tm, vocab, word_ids, lexicon = _toy_system(rng, n_words=12)
    model = train_arpa(_sentences(rng, vocab, n=50, lo=2, hi=5), order=2)
    g_vec = arpa_to_fst(model, word_ids)
    g_obj = g_vec.to_fst()

    collapsed = make_decode_graph(tm, lexicon, word_ids, grammar=g_obj)
    hclg = make_word_decode_graph(tm, lexicon, word_ids, g_vec)

    dec_a = LatticeDecoder(collapsed, beam=1e9, max_active=10 ** 9)
    dec_b = LatticeDecoder(hclg, beam=1e9, max_active=10 ** 9)
    for _ in range(4):
        words = [vocab[rng.randint(len(vocab))] for _ in range(rng.randint(1, 4))]
        obs = _obs_for_words(tm, lexicon, words, rng)
        wa, _, sa = dec_a.decode(obs)
        wb, _, sb = dec_b.decode(obs)
        assert wa == wb == [word_ids[w] for w in words]
        assert sa == pytest.approx(sb, abs=1e-3)


def test_build_graph_cli_arpa(tmp_path):
    """bin/build_graph decode -arpa → .npz HCLG → LatticeDecoder round trip."""
    from pykaldi2_tpu.bin.build_graph import main as bg_main
    from pykaldi2_tpu.graph.vfst import VectorFst

    rng = np.random.RandomState(9)
    tm, vocab, word_ids, lexicon = _toy_system(rng, n_phones=10, n_words=40)
    model = train_arpa(_sentences(rng, vocab, n=60, lo=2, hi=5), order=2)
    lex_path = tmp_path / "lexicon.txt"
    with open(lex_path, "w") as f:
        for w in vocab:  # read_lexicon assigns ids in file order: keep ours
            f.write(w + " " + " ".join(str(p) for p in lexicon[w][0]) + "\n")
    arpa_path = tmp_path / "lm.arpa"
    write_arpa(model, str(arpa_path))
    out = tmp_path / "hclg.npz"
    rc = bg_main(["decode", "-lexicon", str(lex_path), "-arpa", str(arpa_path),
                  "-out", str(out), "-words_out", str(tmp_path / "words.txt")])
    assert rc == 0
    hclg = VectorFst.load(str(out))
    dec = LatticeDecoder(hclg, beam=1e9, max_active=10 ** 9)
    words = [vocab[3], vocab[7]]
    obs = _obs_for_words(tm, lexicon, words, rng)
    hyp, _, _ = dec.decode(obs)
    assert hyp == [word_ids[w] for w in words]


@pytest.mark.slow
def test_wer_run_1k_words_trigram():
    """VERDICT item-2 'done' criterion: ≥1k-word vocabulary, trigram LM,
    graph build in seconds, WER ≈ 0 on separable synthetic acoustics."""
    rng = np.random.RandomState(11)
    tm, vocab, word_ids, lexicon = _toy_system(
        rng, n_phones=30, n_words=1200, pron_len=(3, 7))
    sents = _sentences(rng, vocab, n=800, lo=3, hi=8)
    model = train_arpa(sents, order=3)

    t0 = time.time()
    hclg = make_word_decode_graph(tm, lexicon, word_ids, model)
    build_s = time.time() - t0
    assert hclg.num_states > 10_000
    assert build_s < 120.0, f"graph build took {build_s:.1f}s"

    dec = LatticeDecoder(hclg, beam=14.0, max_active=7000)
    errs = words_total = 0
    t0 = time.time()
    n_utts = 20
    for i in range(n_utts):
        ref = sents[i][:6]
        obs = _obs_for_words(tm, lexicon, ref, rng)
        hyp, _, _ = dec.decode(obs)
        ref_ids = [word_ids[w] for w in ref]
        errs += edit_distance(ref_ids, hyp)["errors"]
        words_total += len(ref_ids)
    decode_s = time.time() - t0
    wer = errs / max(words_total, 1)
    assert wer <= 0.02, f"WER {wer:.3f} on separable synthetic acoustics"
    assert decode_s < 120.0


def test_lattice_lmrescore_fixes_homophones():
    """Decode with a unigram-LM HCLG, rescore lattices with the trigram:
    homophones are acoustically identical, so only the stronger LM (applied
    via lattice-lmrescore semantics) can pick the contextually right word."""
    from pykaldi2_tpu.decode.lattice import (best_path, lattice_word_fst,
                                             lmrescore)

    rng = np.random.RandomState(13)
    phones = list(range(1, 13))
    tm = TransitionModel(HmmTopology.one_state(phones))
    # 6 homophone pairs a{i}/b{i} + 2 context words with unique prons
    vocab, lexicon = [], {}
    seen = set()

    def fresh_pron(lo=3, hi=6):
        while True:
            L = rng.randint(lo, hi)
            pron = tuple(int(rng.choice(phones)) for _ in range(L))
            if pron not in seen:
                seen.add(pron)
                return list(pron)

    for i in range(6):
        pron = fresh_pron()
        for prefix in ("a", "b"):
            w = f"{prefix}{i}"
            vocab.append(w)
            lexicon[w] = [list(pron)]  # identical pronunciation
    for ctx in ("ca", "cb"):
        vocab.append(ctx)
        lexicon[ctx] = [fresh_pron()]
    word_ids = {w: i + 1 for i, w in enumerate(vocab)}

    # training text: 'ca' is always followed by an a-word, 'cb' by a b-word
    sents = []
    for _ in range(400):
        i = rng.randint(6)
        if rng.rand() < 0.5:
            sents.append(["ca", f"a{i}"])
        else:
            sents.append(["cb", f"b{i}"])
    uni = train_arpa(sents, order=1)
    tri = train_arpa(sents, order=3)

    hclg = make_word_decode_graph(tm, lexicon, word_ids, uni)
    dec = LatticeDecoder(hclg, beam=20.0, max_active=7000, lattice_beam=12.0)
    g_old = arpa_to_fst(uni, word_ids).to_fst()
    g_new = arpa_to_fst(tri, word_ids).to_fst()

    id2w = {i: w for w, i in word_ids.items()}
    base_err = resc_err = total = 0
    for k in range(30):
        i = rng.randint(6)
        ref = ["ca", f"a{i}"] if k % 2 == 0 else ["cb", f"b{i}"]
        obs = _obs_for_words(tm, lexicon, ref, rng, strength=6.0)
        lat, frames, _ = dec.decode_lattice(obs, with_frames=True)
        wf = lattice_word_fst(lat, loglikes=obs, frames=frames)
        hyp_base, _ = best_path(wf)
        hyp_resc, _ = best_path(lmrescore(wf, g_old, g_new))
        ref_ids = [word_ids[w] for w in ref]
        base_err += edit_distance(ref_ids, hyp_base)["errors"]
        resc_err += edit_distance(ref_ids, hyp_resc)["errors"]
        total += len(ref_ids)
    # unigram can't separate homophones: expect roughly half of the
    # second-position words wrong; the trigram rescoring should fix ~all
    assert base_err > total * 0.1, (base_err, total)
    assert resc_err <= base_err // 4, (resc_err, base_err)


@pytest.mark.skipif("PK2_SLOW_TESTS" not in __import__("os").environ,
                    reason="50k-word build takes ~1 min; set PK2_SLOW_TESTS=1")
def test_graph_build_50k_words():
    """Large-lexicon scalability (round-1 'won't survive 200k words' concern):
    50k-word trigram HCLG must build in minutes, not hours. Measured
    2026-08-16: 20.2 s, 4.77M states / 9.4M arcs (BASELINE.md)."""
    rng = np.random.RandomState(0)
    phones = list(range(1, 43))
    tm = TransitionModel(HmmTopology.three_state(phones))
    vocab = [f"w{i}" for i in range(50_000)]
    word_ids = {w: i + 1 for i, w in enumerate(vocab)}
    lexicon, seen = {}, set()
    for w in vocab:
        while True:
            L = rng.randint(4, 9)
            pron = tuple(int(rng.choice(phones)) for _ in range(L))
            if pron not in seen:
                seen.add(pron)
                break
        lexicon[w] = [list(pron)]
    sents = [list(rng.choice(vocab, rng.randint(3, 9))) for _ in range(4000)]
    model = train_arpa(sents, order=3)
    t0 = time.time()
    hclg = make_word_decode_graph(tm, lexicon, word_ids, model)
    dt = time.time() - t0
    assert hclg.num_states > 1_000_000
    assert dt < 300.0, f"50k-word HCLG build took {dt:.0f}s"
