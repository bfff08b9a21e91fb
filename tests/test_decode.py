"""Native decoder + WER tests, including a full train→decode→WER loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.decode import LatticeDecoder, edit_distance, score_corpus
from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_decode_graph
from pykaldi2_tpu.ops.fb import fsa_occupancies, pack_graph

NUM_PHONES = 4


def _tm():
    return TransitionModel(HmmTopology.one_state(range(1, NUM_PHONES + 1)))


def _graph_and_words(sil_prob=0.0):
    tm = _tm()
    # words: wa=[1], wb=[2,3], wc=[4]
    lexicon = {"wa": [[1]], "wb": [[2, 3]], "wc": [[4]]}
    word_ids = {"wa": 1, "wb": 2, "wc": 3}
    g = make_decode_graph(tm, lexicon, word_ids, sil_prob=sil_prob)
    return tm, g, word_ids


def test_edit_distance():
    d = edit_distance("abc", "abc")
    assert d["errors"] == 0
    d = edit_distance(["a", "b", "c"], ["a", "x", "c", "d"])
    assert d["errors"] == 2 and d["subs"] == 1 and d["ins"] == 1
    d = edit_distance("abcd", "ad")
    assert d["errors"] == 2 and d["dels"] == 2
    s = score_corpus({"u1": ["a", "b"], "u2": ["c"]}, {"u1": ["a", "b"]})
    assert s["num_missing"] == 1 and s["errors"] == 1


def test_decoder_best_path_recovers_words():
    tm, g, word_ids = _graph_and_words()
    dec = LatticeDecoder(g, beam=32.0)
    # obs favoring phones 1, 2, 3, 3, 4 → words wa wb wc (pdfs 0,1,2,2,3)
    seq = [0, 1, 2, 2, 3]
    T = len(seq)
    obs = np.full((T, tm.num_pdfs), -8.0, np.float32)
    for t, p in enumerate(seq):
        obs[t, p] = 0.0
    words, pdfs, score = dec.decode(obs)
    assert words == [word_ids["wa"], word_ids["wb"], word_ids["wc"]]
    np.testing.assert_array_equal(pdfs, seq)
    assert np.isfinite(score)


def test_decoder_lattice_feeds_fb():
    tm, g, _ = _graph_and_words()
    dec = LatticeDecoder(g, beam=32.0, lattice_beam=20.0)
    rng = np.random.RandomState(0)
    T = 6
    obs = (rng.randn(T, tm.num_pdfs) * 2).astype(np.float32)
    lat, best = dec.decode_lattice(obs)
    assert lat.num_arcs > T  # more than one path survived
    packed = pack_graph(lat)
    lz, gamma = fsa_occupancies(jnp.asarray(obs[None]), packed, jnp.asarray([T]))
    gamma = np.asarray(gamma)
    assert np.isfinite(float(lz[0]))
    np.testing.assert_allclose(gamma[0].sum(-1), 1.0, atol=1e-4)
    # best lattice path score equals decoder best score (within float tol):
    # lattice includes the Viterbi path, and logZ >= best path score
    assert float(lz[0]) >= best - 1e-3


def test_decoder_beam_failure_raises():
    tm, g, _ = _graph_and_words()
    dec = LatticeDecoder(g, beam=1e-8, max_active=1)
    obs = np.full((3, tm.num_pdfs), -1.0, np.float32)
    # beam so tight the fallback still yields a path via max_active=1: should
    # still decode (tokens survive within beam of frame best)
    words, pdfs, score = dec.decode(obs)
    assert len(pdfs) == 3


def test_e2e_train_decode_wer(tmp_path):
    """CE-train on the toy corpus, decode with a phone-loop graph, check WER."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import ChunkDataloader
    from pykaldi2_tpu.data.dataset import SpeechDataset
    from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_ce_train_step
    from pykaldi2_tpu.utils import make_optimizer
    from toydata import make_toy_corpus

    paths = make_toy_corpus(str(tmp_path), num_utts=6, num_pdfs=NUM_PHONES, seed=11)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    mcfg = ModelConfig(type="blstm", input_size=feat_fn.dim, hidden_size=32, num_layers=1,
                       output_size=NUM_PHONES, compute_dtype="float32")
    model = build_model(mcfg)
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-2))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_ce_train_step(model, feat_fn, opt, mesh=None)
    key = jax.random.PRNGKey(1)
    for epoch in range(15):
        loader = ChunkDataloader(ds, batch_size=8, chunk_len=40, seed=2)
        loader.set_epoch(epoch)
        for batch in loader:
            key, sk = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, sk)
    assert float(m["frame_acc"]) > 0.75

    # decode graph: one word per phone
    tm = _tm()
    lexicon = {f"w{p}": [[p]] for p in range(1, NUM_PHONES + 1)}
    word_ids = {f"w{p}": p for p in range(1, NUM_PHONES + 1)}
    graph = make_decode_graph(tm, lexicon, word_ids)
    dec = LatticeDecoder(graph, beam=24.0)

    @jax.jit
    def forward(wave, mask):
        feats = feat_fn({"wave": wave, "mask": mask})
        logits = model.apply(params, feats, mask)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1)

    refs, hyps = {}, {}
    for uid in ds.utt_ids:
        utt = ds.get(uid)
        wave = utt.wave[None]
        mask = np.ones((1, utt.num_frames), np.float32)
        obs = np.asarray(forward(jnp.asarray(wave), jnp.asarray(mask)))[0]
        words, _, _ = dec.decode(obs[: utt.num_frames])
        hyps[uid] = [f"w{w}" for w in words]
        refs[uid] = [f"w{p}" for p in collapse_to_phones(utt.labels + 1)]
    result = score_corpus(refs, hyps)
    # toy task: most words should be recognized
    assert result["wer"] < 40.0, result


def test_on_device_decoding_matches_host():
    from pykaldi2_tpu.decode.on_device import dense_from_pdf_fst, viterbi_decode_words
    from pykaldi2_tpu.ops.fb import pack_graph

    tm, g, word_ids = _graph_and_words()
    dense = pack_graph(dense_from_pdf_fst(g))
    host = LatticeDecoder(g, beam=32.0)
    rng = np.random.RandomState(9)
    B, T = 3, 7
    obs = (rng.randn(B, T, tm.num_pdfs) * 2).astype(np.float32)
    nf = np.array([7, 5, 7], np.int32)
    words_b, pdfs_b, scores = viterbi_decode_words(jnp.asarray(obs), dense, jnp.asarray(nf))
    for b in range(B):
        w_host, p_host, s_host = host.decode(obs[b, : nf[b]])
        assert words_b[b] == w_host, (b, words_b[b], w_host)
        np.testing.assert_array_equal(pdfs_b[b, : nf[b]], p_host)
        np.testing.assert_allclose(scores[b], s_host, rtol=1e-4, atol=1e-4)
    assert (pdfs_b[1, 5:] == -1).all()
