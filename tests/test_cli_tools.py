"""CLI coverage: compute_cmvn_stats, decode with -dump_ark, model variants."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                 ModelConfig, OptimizerConfig)
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.dataloader import ChunkDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.pipeline import FeaturePipeline, load_cmvn_stats
from pykaldi2_tpu.trainer import make_ce_train_step
from pykaldi2_tpu.utils import make_optimizer, save_checkpoint

from toydata import make_toy_corpus


def _yamls(tmp_path, paths, num_pdfs=4, model_type="blstm"):
    data_yaml = {"wav_scp": paths["wav_scp"], "label_ark": paths["ali"],
                 "feat": {"fbank": {"frame_opts": {"dither": 0.0},
                                    "mel_opts": {"num_bins": 24}}}}
    cfg_yaml = {"model": {"type": model_type, "hidden_size": 24, "num_layers": 1,
                          "output_size": num_pdfs, "compute_dtype": "float32"}}
    dp, cp = str(tmp_path / "d.yaml"), str(tmp_path / "c.yaml")
    yaml.dump(data_yaml, open(dp, "w"))
    yaml.dump(cfg_yaml, open(cp, "w"))
    return dp, cp


def test_compute_cmvn_stats_cli(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=3, seed=15)
    dp, _ = _yamls(tmp_path, paths)
    out = str(tmp_path / "cmvn.stats")
    from pykaldi2_tpu.bin.compute_cmvn_stats import main
    assert main(["-data", dp, "-output", out]) == 0
    stats = load_cmvn_stats(out)
    assert stats.shape == (2, 25)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                       frame_opts=FrameOpts(dither=0.0))
    total = sum(ds.utt_num_frames(u) for u in ds.utt_ids)
    assert int(stats[0, 24]) == total


def test_compute_cmvn_stats_cli_spk2utt(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=4, seed=17)
    dp, _ = _yamls(tmp_path, paths)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                       frame_opts=FrameOpts(dither=0.0))
    spk2utt = str(tmp_path / "spk2utt")
    uids = list(ds.utt_ids)
    with open(spk2utt, "w") as f:
        f.write("spkA " + " ".join(uids[:2]) + "\n")
        f.write("spkB " + " ".join(uids[2:]) + "\n")
    out = str(tmp_path / "cmvn.ark")
    from pykaldi2_tpu.bin.compute_cmvn_stats import main
    assert main(["-data", dp, "-output", out, "-spk2utt", spk2utt]) == 0
    from pykaldi2_tpu.data import kaldi_io
    stats = dict(kaldi_io.read_ark(out, kind="mat"))
    assert set(stats) == {"spkA", "spkB"}
    want = sum(ds.utt_num_frames(u) for u in uids[:2])
    assert int(stats["spkA"][0, -1]) == want
    # the scp + SpeakerCmvn consume it directly
    from pykaldi2_tpu.frontend.cmvn import SpeakerCmvn
    u2s = str(tmp_path / "utt2spk")
    with open(u2s, "w") as f:
        for u in uids[:2]:
            f.write(f"{u} spkA\n")
        for u in uids[2:]:
            f.write(f"{u} spkB\n")
    sc = SpeakerCmvn(u2s, out + ".scp")
    m, s = sc.lookup(uids[0])
    assert m.shape == (24,)


def test_decode_cli_with_dump_ark(tmp_path):
    num_pdfs = 4
    paths = make_toy_corpus(str(tmp_path / "c"), num_utts=3, num_pdfs=num_pdfs, seed=16)
    dp, cp = _yamls(tmp_path, paths)
    # quick-train a model and save it
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="blstm", input_size=feat_fn.dim, hidden_size=24,
                                    num_layers=1, output_size=num_pdfs, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-2))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_ce_train_step(model, feat_fn, opt, mesh=None)
    key = jax.random.PRNGKey(1)
    for epoch in range(8):
        for batch in ChunkDataloader(ds, batch_size=4, chunk_len=40, seed=3):
            key, sk = jax.random.split(key)
            params, opt_state, _ = step(params, opt_state, batch, sk)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params)

    # build decode graph + words
    lex = str(tmp_path / "lex.txt")
    with open(lex, "w") as f:
        for p in range(1, num_pdfs + 1):
            f.write(f"w{p} {p}\n")
    from pykaldi2_tpu.bin.build_graph import main as bg
    g_out, w_out = str(tmp_path / "g.txt"), str(tmp_path / "w.txt")
    assert bg(["decode", "-lexicon", lex, "-out", g_out, "-words_out", w_out]) == 0

    # reference transcripts
    from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as f:
        for uid in ds.utt_ids:
            words = " ".join(f"w{p}" for p in collapse_to_phones(ds.labels[uid] + 1))
            f.write(f"{uid} {words}\n")

    from pykaldi2_tpu.bin.decode import main as dec
    hyp = str(tmp_path / "hyp.txt")
    dump = str(tmp_path / "post.ark")
    assert dec(["-config", cp, "-data", dp, "-model", ckpt, "-graph", g_out,
                "-words", w_out, "-ref", ref, "-hyp_out", hyp,
                "-acoustic_scale", "1.0", "-dump_ark", dump]) == 0
    assert os.path.exists(hyp) and os.path.getsize(hyp) > 0
    posts = dict(kaldi_io.read_ark(dump, kind="mat"))
    assert set(posts) == set(ds.utt_ids)
    for uid in ds.utt_ids:
        assert posts[uid].shape == (ds.utt_num_frames(uid), num_pdfs)

    # lattice modes: -lattice_out / -nbest / -oracle (Kaldi lattice-* slice)
    lat_out = str(tmp_path / "lat.txt")
    nb_out = str(tmp_path / "nb.txt")
    assert dec(["-config", cp, "-data", dp, "-model", ckpt, "-graph", g_out,
                "-words", w_out, "-ref", ref, "-acoustic_scale", "1.0",
                "-lattice_out", lat_out, "-nbest", "3", "-nbest_out", nb_out,
                "-oracle"]) == 0
    from pykaldi2_tpu.decode.lattice import best_path, read_lattices_text

    lats = read_lattices_text(lat_out)
    assert set(lats) == set(ds.utt_ids)
    for uid, wf in lats.items():
        words, score = best_path(wf)
        assert np.isfinite(score)
    nb_lines = open(nb_out).read().strip().splitlines()
    assert len(nb_lines) >= len(ds.utt_ids)  # ≥1 hypothesis per utt
    # the lattice_tool CLI consumes the dumped archive end-to-end
    from pykaldi2_tpu.bin.lattice_tool import main as lt_main

    hyp2 = str(tmp_path / "hyp2.txt")
    assert lt_main(["-lattices", lat_out, "-words", w_out,
                    "-best_path", hyp2, "-ref", ref]) == 0
    assert os.path.getsize(hyp2) > 0

    # consensus decoding + CTM with confidences (lattice-mbr-decode /
    # lattice-to-ctm-conf slice); times come from the decoder lattice
    ctm_out = str(tmp_path / "out.ctm")
    hyp3 = str(tmp_path / "hyp3.txt")
    assert dec(["-config", cp, "-data", dp, "-model", ckpt, "-graph", g_out,
                "-words", w_out, "-ref", ref, "-acoustic_scale", "1.0",
                "-mbr", "-ctm_out", ctm_out, "-hyp_out", hyp3]) == 0
    ctm_lines = open(ctm_out).read().strip().splitlines()
    assert len(ctm_lines) >= len(ds.utt_ids)
    for line in ctm_lines:
        parts = line.split()
        assert len(parts) == 6
        assert 0.0 <= float(parts[5]) <= 1.0   # confidence
        assert float(parts[3]) > 0.0           # duration
    # this toy graph is a FREE word loop (no LM/insertion penalty), so the
    # lattice posterior genuinely spreads over re-entering the same word
    # frame-by-frame — the consensus keeps those repeats.  Collapsed runs
    # must match the best path exactly.
    def _collapse(line):
        parts = line.split()
        out = parts[:1]
        for w in parts[1:]:
            if w != out[-1]:
                out.append(w)
        return out

    h_best = {l.split()[0]: _collapse(l) for l in open(hyp)}
    for line in open(hyp3):
        assert _collapse(line) == h_best[line.split()[0]]

    # LM-scale sweep (Kaldi scoring lmwt sweep): per-scale WER + a best pick
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert dec(["-config", cp, "-data", dp, "-model", ckpt,
                    "-graph", g_out, "-words", w_out, "-ref", ref,
                    "-acoustic_scale", "1.0",
                    "-lm_scale_sweep", "0.5:2.0:0.5"]) == 0
    out_text = buf.getvalue()
    assert len([l for l in out_text.splitlines()
                if l.startswith("lm_scale ")]) == 4
    assert "best lm_scale " in out_text


def test_tdnn_and_transformer_training(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=6, num_pdfs=4, seed=17)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    for mtype, extra in [("tdnn", {"tdnn_dilations": (1, 2)}),
                         ("transformer", {"num_heads": 4, "ffn_size": 64})]:
        model = build_model(ModelConfig(type=mtype, input_size=feat_fn.dim, hidden_size=32,
                                        num_layers=2, output_size=4, compute_dtype="float32",
                                        **extra))
        opt = make_optimizer(OptimizerConfig(type="adam", lr=5e-3))
        params = model.init(jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        step = make_ce_train_step(model, feat_fn, opt, mesh=None)
        key = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(6):
            for batch in ChunkDataloader(ds, batch_size=8, chunk_len=40, seed=4):
                key, sk = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, batch, sk)
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (mtype, losses[0], losses[-1])


def test_compare_posteriors_cli(tmp_path):
    from pykaldi2_tpu.bin.compare_posteriors import main as cmp_main
    rng = np.random.RandomState(30)
    mats = {f"u{i}": rng.randn(20 + i, 6).astype(np.float32) for i in range(3)}
    a, b, c = (str(tmp_path / n) for n in ("a.ark", "b.ark", "c.ark"))
    for path, noise in [(a, 0.0), (b, 1e-5), (c, 0.5)]:
        with kaldi_io.ArkWriter(path, kind="mat") as w:
            for k, m in mats.items():
                w.write(k, m + rng.randn(*m.shape).astype(np.float32) * noise)
    assert cmp_main([a, b, "-atol", "1e-3"]) == 0       # within tolerance
    assert cmp_main([a, c, "-atol", "1e-3"]) == 1       # grossly different


def test_compute_feats_cli(tmp_path):
    """compute-fbank-feats parity tool: dumped ark matches direct extraction
    (to fp32 reduction-order noise) and feeds the feats_scp corpus mode."""
    import jax.numpy as jnp

    from pykaldi2_tpu.bin.compute_feats import main as cf
    from pykaldi2_tpu.data import kaldi_io

    paths = make_toy_corpus(str(tmp_path / "c"), num_utts=4, num_pdfs=3, seed=21)
    dp = str(tmp_path / "data.yaml")
    with open(dp, "w") as f:
        f.write(f"""wav_scp: {paths['wav_scp']}
feat:
  fbank:
    frame_opts: {{dither: 0.0}}
    mel_opts: {{num_bins: 24}}
""")
    out = str(tmp_path / "feats.ark")
    assert cf(["-data", dp, "-out", out]) == 0
    feats = dict(kaldi_io.read_ark(out, kind="mat"))

    ds = SpeechDataset(wav_scp=paths["wav_scp"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=24)))
    feat_cfg.cmvn.norm_means = False  # the tool dumps BASE features
    pipe = FeaturePipeline(feat_cfg)
    assert set(feats) == set(ds.utt_ids)
    for uid in ds.utt_ids:
        utt = ds.get(uid)
        ref = np.asarray(pipe({"wave": jnp.asarray(utt.wave[None])}))[0]
        assert feats[uid].shape == (utt.num_frames, pipe.dim)
        np.testing.assert_allclose(feats[uid], ref[: utt.num_frames],
                                   atol=1e-4)

    # the dumped scp is a working feats-mode corpus
    ds2 = SpeechDataset(feats_scp=out[:-4] + ".scp")
    assert set(ds2.utt_ids) == set(ds.utt_ids)
    np.testing.assert_array_equal(ds2.get(ds.utt_ids[0]).feats,
                                  feats[ds.utt_ids[0]])


def test_decode_cli_device_decoder(tmp_path):
    """-decoder device: the batched on-accelerator lattice search must
    produce the same hypotheses as the host decoder through the full CLI
    (plain WER mode AND the lattice modes)."""
    num_pdfs = 4
    paths = make_toy_corpus(str(tmp_path / "c"), num_utts=3,
                            num_pdfs=num_pdfs, seed=21)
    dp, cp = _yamls(tmp_path, paths, model_type="lstm")
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                       frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=24, num_layers=1,
                                    output_size=num_pdfs,
                                    compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-2))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_ce_train_step(model, feat_fn, opt, mesh=None)
    key = jax.random.PRNGKey(1)
    for epoch in range(6):
        for batch in ChunkDataloader(ds, batch_size=4, chunk_len=40, seed=3):
            key, sk = jax.random.split(key)
            params, opt_state, _ = step(params, opt_state, batch, sk)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params)

    lex = str(tmp_path / "lex.txt")
    with open(lex, "w") as f:
        for p in range(1, num_pdfs + 1):
            f.write(f"w{p} {p}\n")
    from pykaldi2_tpu.bin.build_graph import main as bg
    g_out, w_out = str(tmp_path / "g.txt"), str(tmp_path / "w.txt")
    assert bg(["decode", "-lexicon", lex, "-out", g_out,
               "-words_out", w_out]) == 0
    from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as f:
        for uid in ds.utt_ids:
            words = " ".join(
                f"w{p}" for p in collapse_to_phones(ds.labels[uid] + 1))
            f.write(f"{uid} {words}\n")

    from pykaldi2_tpu.bin.decode import main as dec
    common = ["-config", cp, "-data", dp, "-model", ckpt, "-graph", g_out,
              "-words", w_out, "-ref", ref, "-acoustic_scale", "1.0",
              "-beam", "24.0", "-lattice_beam", "12.0", "-max_active", "32"]
    hyp_h, hyp_d = str(tmp_path / "h.txt"), str(tmp_path / "d.txt")
    assert dec(common + ["-hyp_out", hyp_h]) == 0
    assert dec(common + ["-hyp_out", hyp_d, "-decoder", "device"]) == 0
    host = dict(l.split(None, 1) for l in open(hyp_h))
    device = dict(l.split(None, 1) for l in open(hyp_d))
    assert device == host

    # lattice modes through the device decoder
    lat_out = str(tmp_path / "lat.txt")
    nb_out = str(tmp_path / "nb.txt")
    ctm_out = str(tmp_path / "out.ctm")
    assert dec(common + ["-decoder", "device", "-lattice_out", lat_out,
                         "-nbest", "3", "-nbest_out", nb_out, "-oracle",
                         "-max_arcs", "256"]) == 0
    from pykaldi2_tpu.decode.lattice import best_path, read_lattices_text
    lats = read_lattices_text(lat_out)
    assert set(lats) == set(ds.utt_ids)
    for uid, wf in lats.items():
        words, score = best_path(wf)
        assert np.isfinite(score)
    assert len(open(nb_out).read().strip().splitlines()) >= len(ds.utt_ids)
    hyp_m = str(tmp_path / "m.txt")
    assert dec(common + ["-decoder", "device", "-mbr", "-ctm_out", ctm_out,
                         "-hyp_out", hyp_m, "-max_arcs", "256"]) == 0
    assert len(open(ctm_out).read().strip().splitlines()) >= len(ds.utt_ids)
