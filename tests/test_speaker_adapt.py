"""Per-speaker CMVN and per-utterance VTLN warps (VERDICT r1 item 8).

Reference behavior: Kaldi apply-cmvn --utt2spk=ark:utt2spk scp:cmvn.scp
(kaldi/src/featbin/apply-cmvn.cc) and the --vtln-map warp tables
(SURVEY.md §3.1 Dataset row, §3.2 Kaldi feat). Golden checks: the per-row
paths must equal running the plain pipeline with that speaker's global stats
/ that utterance's warp factor.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.config import CmvnOpts, FbankOpts, FeatConfig, FrameOpts, MelOpts
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.frontend.cmvn import SpeakerCmvn, acc_cmvn_stats, cmvn_mean_std
from pykaldi2_tpu.pipeline import FeaturePipeline


def _write_spk_tables(tmp_path, spk_feats, utt2spk):
    u2s = tmp_path / "utt2spk"
    with open(u2s, "w") as f:
        for u, s in utt2spk.items():
            f.write(f"{u} {s}\n")
    ark = str(tmp_path / "cmvn.ark")
    scp = str(tmp_path / "cmvn.scp")
    with kaldi_io.ArkWriter(ark, scp, kind="mat") as w:
        for spk, feats_list in spk_feats.items():
            stats = None
            for feats in feats_list:
                stats = acc_cmvn_stats(feats, stats)
            w.write(spk, stats)
    return str(u2s), scp


def test_speaker_cmvn_lookup_matches_direct_stats(tmp_path):
    rng = np.random.RandomState(0)
    spk_feats = {
        "spkA": [rng.randn(50, 8) + 3.0, rng.randn(30, 8) + 3.0],
        "spkB": [rng.randn(40, 8) * 2.0 - 1.0],
    }
    utt2spk = {"u1": "spkA", "u2": "spkA", "u3": "spkB"}
    u2s, scp = _write_spk_tables(tmp_path, spk_feats, utt2spk)
    sc = SpeakerCmvn(u2s, scp, norm_means=True, norm_vars=True)
    # golden: recompute stats directly
    for spk, fl in spk_feats.items():
        stats = None
        for f in fl:
            stats = acc_cmvn_stats(f, stats)
        mean, scale = cmvn_mean_std(stats, norm_vars=True)
        for u, s in utt2spk.items():
            if s != spk:
                continue
            m, sc_ = sc.lookup(u)
            np.testing.assert_allclose(m, mean, rtol=1e-6)
            np.testing.assert_allclose(sc_, scale, rtol=1e-6)
    with pytest.raises(KeyError):
        sc.lookup("unknown_utt")
    # batch stacking + padding neutrality through the pipeline helper
    cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=8)),
        cmvn=CmvnOpts(norm_vars=True, utt2spk=u2s, spk_stats_scp=scp))
    pipe = FeaturePipeline(cfg)
    assert pipe.has_extras
    ex = pipe.batch_extras(["u1", "u3", ""])
    assert ex["cmvn_mean"].shape == (3, 8)
    np.testing.assert_array_equal(ex["cmvn_mean"][2], np.zeros(8))
    np.testing.assert_array_equal(ex["cmvn_scale"][2], np.ones(8))


def test_pipeline_per_speaker_cmvn_matches_global(tmp_path):
    """Rows normalized with speaker stats == plain pipeline fed those stats
    globally."""
    rng = np.random.RandomState(1)
    n_mel = 8
    # fabricate speaker stats in FEATURE space (what the pipeline normalizes)
    spk_feats = {"spkA": [rng.randn(64, n_mel) + 5], "spkB": [rng.randn(64, n_mel) - 2]}
    utt2spk = {"uA": "spkA", "uB": "spkB"}
    u2s, scp = _write_spk_tables(tmp_path, spk_feats, utt2spk)

    fo = FrameOpts(dither=0.0)
    wave = (rng.randn(2, 4000) * 1000).astype(np.float32)
    base_cfg = FeatConfig(fbank=FbankOpts(frame_opts=fo, mel_opts=MelOpts(num_bins=n_mel)))

    cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=fo, mel_opts=MelOpts(num_bins=n_mel)),
        cmvn=CmvnOpts(norm_vars=True, utt2spk=u2s, spk_stats_scp=scp))
    pipe = FeaturePipeline(cfg)
    batch = {"wave": jnp.asarray(wave)}
    batch.update({k: jnp.asarray(v) for k, v in pipe.batch_extras(["uA", "uB"]).items()})
    got = np.asarray(pipe(batch))

    for i, spk in enumerate(["spkA", "spkB"]):
        stats = acc_cmvn_stats(spk_feats[spk][0])
        gp = FeaturePipeline(
            FeatConfig(fbank=base_cfg.fbank, cmvn=CmvnOpts(norm_vars=True)),
            cmvn_stats=stats)
        want = np.asarray(gp({"wave": jnp.asarray(wave[i : i + 1])}))
        np.testing.assert_allclose(got[i], want[0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("warp", [0.9, 1.0, 1.15])
def test_pipeline_per_utt_vtln_matches_global_warp(tmp_path, warp):
    """warp_id path == plain pipeline with MelOpts(vtln_warp=warp): golden
    per warp factor."""
    rng = np.random.RandomState(2)
    fo = FrameOpts(dither=0.0)
    wave = (rng.randn(3, 4000) * 1000).astype(np.float32)
    table = tmp_path / "utt2warp"
    with open(table, "w") as f:
        f.write("u0 0.9\nu1 1.0\nu2 1.15\n")
    cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=fo, mel_opts=MelOpts(num_bins=8)),
        cmvn=CmvnOpts(norm_means=False),
        utt2warp=str(table))
    pipe = FeaturePipeline(cfg)
    assert pipe.has_extras
    batch = {"wave": jnp.asarray(wave)}
    batch.update({k: jnp.asarray(v) for k, v in
                  pipe.batch_extras(["u0", "u1", "u2"]).items()})
    got = np.asarray(pipe(batch))

    row = {0.9: 0, 1.0: 1, 1.15: 2}[warp]
    ref_cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=fo, mel_opts=MelOpts(num_bins=8, vtln_warp=warp)),
        cmvn=CmvnOpts(norm_means=False))
    ref = FeaturePipeline(ref_cfg)
    want = np.asarray(ref({"wave": jnp.asarray(wave[row : row + 1])}))
    np.testing.assert_allclose(got[row], want[0], rtol=1e-5, atol=1e-5)
    # different warps must actually differ
    assert np.abs(got[0] - got[1]).max() > 1e-3


def test_loader_attaches_extras(tmp_path):
    """SeqDataloader / ChunkDataloader attach per-row extras end-to-end."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from toydata import make_toy_corpus
    from pykaldi2_tpu.data.dataloader import BucketSpec, ChunkDataloader, SeqDataloader
    from pykaldi2_tpu.data.dataset import SpeechDataset

    paths = make_toy_corpus(str(tmp_path / "corpus"), num_utts=5, num_pdfs=4, seed=5)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                       frame_opts=FrameOpts(dither=0.0))
    with open(tmp_path / "utt2warp", "w") as f:
        for i, u in enumerate(ds.utt_ids):
            f.write(f"{u} {0.9 + 0.05 * (i % 3):.2f}\n")
    cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=8)),
        utt2warp=str(tmp_path / "utt2warp"))
    pipe = FeaturePipeline(cfg)

    for batch in SeqDataloader(ds, BucketSpec(boundaries=(4000,), batch_sizes=3),
                               shuffle=False, extras_fn=pipe.batch_extras):
        assert "warp_id" in batch and batch["warp_id"].shape == (3,)
        feats = pipe({k: jnp.asarray(v) for k, v in batch.items()
                      if k != "utt_ids"})
        assert np.isfinite(np.asarray(feats)).all()
    for batch in ChunkDataloader(ds, batch_size=4, chunk_len=30, shuffle=False,
                                 extras_fn=pipe.batch_extras):
        assert "warp_id" in batch and batch["warp_id"].shape == (4,)
        break
