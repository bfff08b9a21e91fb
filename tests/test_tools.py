"""CLI tool tests: forced alignment and graph building."""

import os

import numpy as np
import jax
import yaml

from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                 ModelConfig, OptimizerConfig)
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.dataloader import ChunkDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.trainer import make_ce_train_step
from pykaldi2_tpu.utils import make_optimizer, save_checkpoint

from toydata import make_toy_corpus

NUM_PDFS = 4


def _train_quick(tmp_path, ds, feat_fn):
    model = build_model(ModelConfig(type="blstm", input_size=feat_fn.dim, hidden_size=32,
                                    num_layers=1, output_size=NUM_PDFS, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-2))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_ce_train_step(model, feat_fn, opt, mesh=None)
    key = jax.random.PRNGKey(1)
    for epoch in range(12):
        loader = ChunkDataloader(ds, batch_size=8, chunk_len=40, seed=2)
        loader.set_epoch(epoch)
        for batch in loader:
            key, sk = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, sk)
    ckpt = str(tmp_path / "ce.npz")
    save_checkpoint(ckpt, params)
    return ckpt, float(m["frame_acc"])


def test_align_and_build_graph_cli(tmp_path):
    paths = make_toy_corpus(str(tmp_path / "corpus"), num_utts=5, num_pdfs=NUM_PDFS, seed=8)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    ckpt, acc = _train_quick(tmp_path, ds, feat_fn)
    assert acc > 0.6

    # transcripts: word per phone run; lexicon: w<p> -> phone p (pdf p-1)
    text_path = str(tmp_path / "text.txt")
    lex_path = str(tmp_path / "lexicon.txt")
    with open(lex_path, "w") as f:
        for p in range(1, NUM_PDFS + 1):
            f.write(f"w{p} {p}\n")
    with open(text_path, "w") as f:
        for uid in ds.utt_ids:
            phones = collapse_to_phones(ds.labels[uid] + 1)
            f.write(uid + " " + " ".join(f"w{p}" for p in phones) + "\n")

    data_yaml = {"wav_scp": paths["wav_scp"],
                 "feat": {"fbank": {"frame_opts": {"dither": 0.0}, "mel_opts": {"num_bins": 24}}}}
    cfg_yaml = {"model": {"type": "blstm", "hidden_size": 32, "num_layers": 1,
                          "output_size": NUM_PDFS, "compute_dtype": "float32"}}
    dp, cp = str(tmp_path / "d.yaml"), str(tmp_path / "c.yaml")
    yaml.dump(data_yaml, open(dp, "w"))
    yaml.dump(cfg_yaml, open(cp, "w"))

    ali_out = str(tmp_path / "ali_gen.ark")
    from pykaldi2_tpu.bin.align import main as align_main
    assert align_main(["-config", cp, "-data", dp, "-model", ckpt, "-text", text_path,
                       "-lexicon", lex_path, "-out", ali_out]) == 0
    gen = dict(kaldi_io.read_ark(ali_out, kind="ivec"))
    assert set(gen) == set(ds.utt_ids)
    # generated alignments should agree with the true labels reasonably well
    agree = total = 0
    for uid in ds.utt_ids:
        ref = ds.labels[uid]
        hyp = gen[uid]
        assert len(hyp) == len(ref)
        agree += int((hyp == ref).sum())
        total += len(ref)
    assert agree / total > 0.55, agree / total

    # build_graph den from the generated alignments
    from pykaldi2_tpu.bin.build_graph import main as bg_main
    den_out = str(tmp_path / "den.npz")
    assert bg_main(["den", "-ali", ali_out, "-out", den_out]) == 0
    from pykaldi2_tpu.ops.fsa import load_fsa
    den = load_fsa(den_out)
    assert den.num_arcs > 0

    # build_graph decode + words table
    g_out, w_out = str(tmp_path / "g.fst.txt"), str(tmp_path / "words.txt")
    assert bg_main(["decode", "-lexicon", lex_path, "-out", g_out, "-words_out", w_out]) == 0
    from pykaldi2_tpu.graph.fst import Fst
    g = Fst.read_text(g_out)
    assert g.num_arcs > 0
    words = open(w_out).read().split()
    assert "w1" in words

    # binary OpenFst output (.fst) carries the identical graph
    gb_out = str(tmp_path / "g.fst")
    assert bg_main(["decode", "-lexicon", lex_path, "-out", gb_out]) == 0
    from pykaldi2_tpu.graph.openfst_io import read_openfst
    gb = read_openfst(gb_out)
    assert gb.num_states == g.num_states and gb.num_arcs == g.num_arcs
    for s in range(g.num_states):
        a1 = [(a.ilabel, a.olabel, a.nextstate) for a in g.arcs[s]]
        a2 = [(a.ilabel, a.olabel, a.nextstate) for a in gb.arcs[s]]
        assert a1 == a2


def test_compute_priors_cli(tmp_path):
    from pykaldi2_tpu.bin.compute_priors import main as cp_main
    from pykaldi2_tpu.graph.topology import HmmTopology
    from pykaldi2_tpu.graph.transition_model import TransitionModel

    # pdf-id alignments
    rng = np.random.RandomState(21)
    ali = str(tmp_path / "ali.ark")
    counts = np.zeros(4)
    with kaldi_io.ArkWriter(ali, kind="ivec") as w:
        for i in range(5):
            v = rng.randint(0, 4, 30).astype(np.int32)
            counts += np.bincount(v, minlength=4)
            w.write(f"u{i}", v)
    out = str(tmp_path / "prior.npy")
    assert cp_main(["-ali", ali, "-out", out]) == 0
    log_prior = np.load(out)
    assert log_prior.shape == (4,)
    np.testing.assert_allclose(np.exp(log_prior), counts / counts.sum(), atol=1e-6)

    # transition-id alignments mapped through final.mdl
    tm = TransitionModel(HmmTopology.one_state([1, 2, 3, 4]))
    mdl = str(tmp_path / "final.mdl")
    tm.write_kaldi(mdl)
    t2p = tm.tid_to_pdf_array()
    # pick one self-loop tid per pdf
    tid_of_pdf = {int(t2p[t]): t for t in range(1, tm.num_tids + 1)}
    ali2 = str(tmp_path / "ali_tid.ark")
    with kaldi_io.ArkWriter(ali2, kind="ivec") as w:
        w.write("u0", np.array([tid_of_pdf[0]] * 3 + [tid_of_pdf[1]] * 1, np.int32))
    out2 = str(tmp_path / "prior2.npy")
    assert cp_main(["-ali", ali2, "-out", out2, "-model", mdl]) == 0
    p2 = np.exp(np.load(out2))
    np.testing.assert_allclose(p2[:2], [0.75, 0.25], atol=1e-6)
    assert (p2[2:] < 1e-9).all()   # floored unseen pdfs


def test_apply_platform_env_axon_alias(monkeypatch):
    """PK2_PLATFORM=tpu must pin the tunnel platform ("axon") when the chip
    is only reachable through it: explicit jax_platforms lists have no
    fallback, so a literal "tpu" dies with "No jellyfish device found"."""
    from pykaldi2_tpu.utils import apply_platform_env

    old = jax.config.jax_platforms
    try:
        monkeypatch.setenv("PK2_PLATFORM", "tpu")
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        apply_platform_env()
        assert jax.config.jax_platforms == "axon"
        # without the tunnel env, tpu stays tpu (real-TPU machines)
        monkeypatch.setenv("JAX_PLATFORMS", "")
        apply_platform_env()
        assert jax.config.jax_platforms == "tpu"
    finally:
        jax.config.update("jax_platforms", old)
