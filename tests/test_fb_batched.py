"""Batched per-utterance-graph FB: parity with shared-graph kernels, padding
invariance, and the full on-the-fly decoded-lattice MMI training mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.ops.fsa import DenseFsa
from pykaldi2_tpu.ops.fb import fsa_logz, fsa_occupancies, pack_graph
from pykaldi2_tpu.ops.fb_batched import (
    fsa_logz_b,
    fsa_occupancies_b,
    mmi_objective_lattice,
    pack_graph_batch,
)


def _toy_graph(seed=0, num_states=4, num_pdfs=3, num_arcs=10):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, num_states, num_arcs).astype(np.int32)
    src[0] = 0
    dst = rng.randint(0, num_states, num_arcs).astype(np.int32)
    pdf = rng.randint(0, num_pdfs, num_arcs).astype(np.int32)
    weight = (rng.randn(num_arcs) * 0.5).astype(np.float32)
    final = np.full(num_states, -np.inf, np.float32)
    final[rng.randint(1, num_states)] = 0.0
    final[0] = -0.5
    return DenseFsa(num_states, src, dst, pdf, weight, final, 0).validate()


def test_batched_matches_shared_graph():
    """Different graphs per row vs per-row shared-graph calls."""
    g1, g2 = _toy_graph(0), _toy_graph(1, num_states=5, num_arcs=14)
    rng = np.random.RandomState(2)
    T = 6
    obs = rng.randn(2, T, 3).astype(np.float32)
    lens = np.array([6, 4], np.int32)
    bg = pack_graph_batch([g1, g2])
    lz_b = np.asarray(fsa_logz_b(jnp.asarray(obs), bg, jnp.asarray(lens)))
    for i, g in enumerate([g1, g2]):
        lz = float(fsa_logz(jnp.asarray(obs[i : i + 1]), pack_graph(g),
                            jnp.asarray(lens[i : i + 1]))[0])
        np.testing.assert_allclose(lz_b[i], lz, rtol=1e-5, atol=1e-5)
    # occupancies match too
    _, gam_b = fsa_occupancies_b(jnp.asarray(obs), bg, jnp.asarray(lens))
    for i, g in enumerate([g1, g2]):
        _, gam = fsa_occupancies(jnp.asarray(obs[i : i + 1]), pack_graph(g),
                                 jnp.asarray(lens[i : i + 1]))
        np.testing.assert_allclose(np.asarray(gam_b)[i], np.asarray(gam)[0],
                                   rtol=1e-4, atol=1e-5)


def test_batched_gradient_matches_finite_diff():
    g1, g2 = _toy_graph(3), _toy_graph(4)
    bg = pack_graph_batch([g1, g2])
    rng = np.random.RandomState(5)
    T = 4
    obs = rng.randn(2, T, 3).astype(np.float32)
    lens = jnp.asarray([T, T])

    grad = jax.grad(lambda o: jnp.sum(fsa_logz_b(o, bg, lens)))(jnp.asarray(obs))
    eps = 1e-3
    for (b, t, p) in [(0, 1, 2), (1, 3, 0), (0, 0, 1)]:
        op = obs.copy(); op[b, t, p] += eps
        om = obs.copy(); om[b, t, p] -= eps
        fd = (float(fsa_logz_b(jnp.asarray(op), bg, lens)[b])
              - float(fsa_logz_b(jnp.asarray(om), bg, lens)[b])) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(grad)[b, t, p]), fd, atol=2e-3)


def test_lattice_mmi_training_mode(tmp_path):
    """Full on-the-fly pipeline: forward → host lattice decode → lattice MMI step."""
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import BucketSpec, SeqDataloader
    from pykaldi2_tpu.data.dataset import SpeechDataset
    from pykaldi2_tpu.decode import LatticeDecoder
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_decode_graph
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_lattice_steps
    from pykaldi2_tpu.utils import make_optimizer
    from toydata import make_toy_corpus

    num_pdfs = 4
    paths = make_toy_corpus(str(tmp_path), num_utts=4, num_pdfs=num_pdfs, seed=6)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=24,
                                    num_layers=1, output_size=num_pdfs, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=3e-3))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    tm = TransitionModel(HmmTopology.one_state(range(1, num_pdfs + 1)))
    lexicon = {f"w{p}": [[p]] for p in range(1, num_pdfs + 1)}
    word_ids = {f"w{p}": p for p in range(1, num_pdfs + 1)}
    den_hclg = make_decode_graph(tm, lexicon, word_ids)
    decoder = LatticeDecoder(den_hclg, beam=24.0, lattice_beam=12.0)

    forward_fn, train_fn = make_se_lattice_steps(
        model, feat_fn, opt, acoustic_scale=1.0, ce_ratio=0.1)

    from pykaldi2_tpu.ops.fb_batched import pack_graph_batch
    key = jax.random.PRNGKey(1)
    objs = []
    for epoch in range(4):
        loader = SeqDataloader(ds, BucketSpec(boundaries=(256,), batch_sizes=4), shuffle=False)
        for batch in loader:
            batch.pop("utt_ids")
            obs = np.asarray(forward_fn(params, batch))
            lats = []
            for i in range(obs.shape[0]):
                nf = int(batch["num_frames"][i])
                if nf == 0:
                    lats.append(DenseFsa(2, np.array([0], np.int32), np.array([1], np.int32),
                                         np.array([0], np.int32), np.array([0.0], np.float32),
                                         np.array([-np.inf, 0.0], np.float32)))
                    continue
                lat, _ = decoder.decode_lattice(obs[i, :nf])
                lats.append(lat)
            den = pack_graph_batch(lats)
            key, sk = jax.random.split(key)
            params, opt_state, m = train_fn(params, opt_state, batch, den, sk)
            objs.append(float(m["objective"]))
    assert np.isfinite(objs).all()
    assert objs[-1] > objs[0], objs
