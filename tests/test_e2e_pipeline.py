"""Full reference workflow end-to-end: CE → sMBR (CE seed) → decode → WER.

This is the recipe-as-test the reference relied on (SURVEY.md §5): CE
training on alignments, sequence-discriminative training seeded from the CE
model, decode with the native beam decoder, score WER — all on the toy
corpus whose labels correlate with spectral content.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                 ModelConfig, OptimizerConfig)
from pykaldi2_tpu.data.dataloader import BucketSpec, ChunkDataloader, SeqDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.decode import LatticeDecoder, score_corpus
from pykaldi2_tpu.graph import (HmmTopology, TransitionModel,
                                estimate_phone_bigram, make_decode_graph)
from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.ops.fb_bigram import make_bigram_den
from pykaldi2_tpu.ops.se_losses import count_labels, priors_from_counts
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.trainer import make_ce_train_step, make_se_train_step
from pykaldi2_tpu.utils import make_optimizer

from toydata import make_toy_corpus

NUM_PDFS = 5


def _wer(ds, model, params, feat_fn, dec, prior):
    @jax.jit
    def forward(wave, mask):
        feats = feat_fn({"wave": wave, "mask": mask})
        logits = model.apply(params, feats, mask)
        logpost = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return logpost - jnp.asarray(prior)

    refs, hyps = {}, {}
    for uid in ds.utt_ids:
        utt = ds.get(uid)
        mask = np.ones((1, utt.num_frames), np.float32)
        obs = np.asarray(forward(jnp.asarray(utt.wave[None]), jnp.asarray(mask)))[0]
        words, _, _ = dec.decode(obs[: utt.num_frames])
        hyps[uid] = [f"w{w}" for w in words]
        refs[uid] = [f"w{p}" for p in collapse_to_phones(utt.labels + 1)]
    return score_corpus(refs, hyps)["wer"]


def test_ce_then_smbr_then_decode(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=8, num_pdfs=NUM_PDFS, seed=23)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="blstm", input_size=feat_fn.dim, hidden_size=32,
                                    num_layers=1, output_size=NUM_PDFS, compute_dtype="float32"))

    # --- stage 1: CE ---
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-2))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    ce_step = make_ce_train_step(model, feat_fn, opt, mesh=None, donate=False)
    key = jax.random.PRNGKey(1)
    for epoch in range(12):
        loader = ChunkDataloader(ds, batch_size=8, chunk_len=40, seed=2)
        loader.set_epoch(epoch)
        for batch in loader:
            key, sk = jax.random.split(key)
            params, opt_state, m = ce_step(params, opt_state, batch, sk)
    ce_acc = float(m["frame_acc"])
    assert ce_acc > 0.6

    # --- stage 2: sMBR seeded from CE ---
    tm = TransitionModel(HmmTopology.one_state(range(1, NUM_PDFS + 1)))
    pdf_to_phone = np.array([p for (p, _j, _pdf) in tm.tuples], np.int32)
    lm = estimate_phone_bigram(
        [collapse_to_phones(pdf_to_phone[l]) for l in ds.labels.values()], tm.topo.phones)
    den = make_bigram_den(tm, lm)
    prior = priors_from_counts(count_labels(ds.labels.values(), NUM_PDFS))
    se_opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=2e-4))
    se_state = se_opt.init(params)
    se_step = make_se_train_step(model, feat_fn, se_opt, den, "smbr", None,
                                 log_prior=prior, acoustic_scale=1.0, ce_ratio=0.1,
                                 donate=False)
    objs = []
    for epoch in range(4):
        loader = SeqDataloader(ds, BucketSpec(boundaries=(256,), batch_sizes=8), shuffle=False)
        for batch in loader:
            batch.pop("utt_ids")
            key, sk = jax.random.split(key)
            params, se_state, m = se_step(params, se_state, batch, sk)
            objs.append(float(m["objective"]))
    assert objs[-1] >= objs[0] - 1e-4  # expected accuracy must not degrade

    # --- stage 3: decode + WER ---
    lexicon = {f"w{p}": [[p]] for p in range(1, NUM_PDFS + 1)}
    word_ids = {f"w{p}": p for p in range(1, NUM_PDFS + 1)}
    dec = LatticeDecoder(make_decode_graph(tm, lexicon, word_ids), beam=24.0)
    wer = _wer(ds, model, params, feat_fn, dec, prior)
    assert wer < 35.0, wer
