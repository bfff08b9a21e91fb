"""Structured bigram den FB vs the generic arc-table kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.graph import HmmTopology, TransitionModel, estimate_phone_bigram, make_den_graph
from pykaldi2_tpu.ops.fb import fsa_logz, fsa_occupancies, pack_graph
from pykaldi2_tpu.ops.fb_bigram import bigram_logz, bigram_occupancies, make_bigram_den

PHONES = [1, 2, 3, 4]


def _setup(nstates):
    topo = (HmmTopology.one_state if nstates == 1 else HmmTopology.three_state)(PHONES)
    tm = TransitionModel(topo)
    lm = estimate_phone_bigram([[1, 2, 3, 4], [2, 1], [3, 3, 2, 4]], PHONES, smoothing=0.7)
    generic = pack_graph(make_den_graph(tm, lm))
    structured = make_bigram_den(tm, lm)
    return tm, generic, structured


@pytest.mark.parametrize("nstates", [1, 3])
def test_bigram_logz_matches_generic(nstates):
    tm, generic, structured = _setup(nstates)
    rng = np.random.RandomState(0)
    B, T = 3, 14
    obs = rng.randn(B, T, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([T, T - 2, nstates * 4])  # incl. minimum-length path
    lz_g = np.asarray(fsa_logz(jnp.asarray(obs), generic, lens))
    lz_s = np.asarray(bigram_logz(jnp.asarray(obs), structured, lens))
    np.testing.assert_allclose(lz_s, lz_g, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nstates", [1, 3])
def test_bigram_occupancies_match_generic(nstates):
    tm, generic, structured = _setup(nstates)
    rng = np.random.RandomState(1)
    B, T = 2, 10
    obs = rng.randn(B, T, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([T, T - 3])
    _, gam_g = fsa_occupancies(jnp.asarray(obs), generic, lens)
    _, gam_s = bigram_occupancies(jnp.asarray(obs), structured, lens)
    np.testing.assert_allclose(np.asarray(gam_s), np.asarray(gam_g), rtol=1e-3, atol=1e-5)


def test_bigram_gradient_is_occupancy():
    tm, generic, structured = _setup(3)
    rng = np.random.RandomState(2)
    obs = rng.randn(1, 9, tm.num_pdfs).astype(np.float32)
    lens = jnp.asarray([9])
    grad = jax.grad(lambda o: jnp.sum(bigram_logz(o, structured, lens)))(jnp.asarray(obs))
    _, gam = fsa_occupancies(jnp.asarray(obs), generic, lens)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(gam), rtol=1e-3, atol=1e-5)


def test_bigram_mmi_in_se_step(tmp_path):
    """make_se_train_step with the structured den graph trains end-to-end."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import BucketSpec, SeqDataloader
    from pykaldi2_tpu.data.dataset import SpeechDataset
    from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.utils import make_optimizer
    from toydata import make_toy_corpus

    paths = make_toy_corpus(str(tmp_path), num_utts=4, num_pdfs=4, seed=12)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=24,
                                    num_layers=1, output_size=4, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=3e-3))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    tm = TransitionModel(HmmTopology.one_state(range(1, 5)))
    pdf_to_phone = np.array([p for (p, _j, _pdf) in tm.tuples], np.int32)
    seqs = [collapse_to_phones(pdf_to_phone[l]) for l in ds.labels.values()]
    lm = estimate_phone_bigram(seqs, tm.topo.phones)
    den = make_bigram_den(tm, lm)
    step = make_se_train_step(model, feat_fn, opt, den, "mmi", None,
                              acoustic_scale=1.0, ce_ratio=0.1)
    key = jax.random.PRNGKey(1)
    objs = []
    for epoch in range(6):
        loader = SeqDataloader(ds, BucketSpec(boundaries=(256,), batch_sizes=4), shuffle=False)
        for batch in loader:
            batch.pop("utt_ids")
            key, sk = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, sk)
            objs.append(float(m["objective"]))
    assert np.isfinite(objs).all()
    assert objs[-1] > objs[0]


@pytest.mark.parametrize("nstates,level", [(1, "pdf"), (3, "pdf"), (3, "phone")])
def test_bigram_expected_accuracy_matches_generic(nstates, level):
    from pykaldi2_tpu.ops.fb import fsa_expected_accuracy
    from pykaldi2_tpu.ops.fb_bigram import bigram_expected_accuracy

    tm, generic, structured = _setup(nstates)
    rng = np.random.RandomState(3)
    B, T = 2, 12
    obs = rng.randn(B, T, tm.num_pdfs).astype(np.float32)
    if level == "pdf":
        ref = rng.randint(0, tm.num_pdfs, (B, T)).astype(np.int32)
    else:
        ref = rng.choice(PHONES, (B, T)).astype(np.int32)
    lens = jnp.asarray([T, T - 3])
    f_g = np.asarray(fsa_expected_accuracy(jnp.asarray(obs), generic, jnp.asarray(ref), lens, level))
    f_s = np.asarray(bigram_expected_accuracy(jnp.asarray(obs), structured, jnp.asarray(ref), lens, level))
    np.testing.assert_allclose(f_s, f_g, rtol=1e-4, atol=1e-4)


def test_bigram_expected_accuracy_gradient_matches_generic():
    from pykaldi2_tpu.ops.fb import fsa_expected_accuracy
    from pykaldi2_tpu.ops.fb_bigram import bigram_expected_accuracy

    tm, generic, structured = _setup(3)
    rng = np.random.RandomState(4)
    obs = rng.randn(1, 8, tm.num_pdfs).astype(np.float32)
    ref = rng.randint(0, tm.num_pdfs, (1, 8)).astype(np.int32)
    lens = jnp.asarray([8])
    g_g = jax.grad(lambda o: jnp.sum(fsa_expected_accuracy(o, generic, jnp.asarray(ref), lens, "pdf")))(jnp.asarray(obs))
    g_s = jax.grad(lambda o: jnp.sum(bigram_expected_accuracy(o, structured, jnp.asarray(ref), lens, "pdf")))(jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g), rtol=1e-3, atol=1e-4)


def test_bigram_long_sequence_stability():
    """Per-step renormalization keeps fp32 finite and consistent at T=2000."""
    tm, generic, structured = _setup(3)
    rng = np.random.RandomState(5)
    T = 2000
    obs = (rng.randn(1, T, tm.num_pdfs) * 3).astype(np.float32)
    lens = jnp.asarray([T])
    lz_s = float(bigram_logz(jnp.asarray(obs), structured, lens)[0])
    lz_g = float(fsa_logz(jnp.asarray(obs), pack_graph(make_den_graph(tm,
        estimate_phone_bigram([[1, 2, 3, 4], [2, 1], [3, 3, 2, 4]], PHONES, smoothing=0.7))),
        lens)[0])
    assert np.isfinite(lz_s)
    np.testing.assert_allclose(lz_s, lz_g, rtol=1e-5)
    _, gam = bigram_occupancies(jnp.asarray(obs), structured, lens)
    gam = np.asarray(gam)
    assert np.isfinite(gam).all()
    # fp32 running-normalizer rounding accumulates ~0.4% over 2000 steps
    np.testing.assert_allclose(gam[0].sum(-1), 1.0, atol=1e-2)
