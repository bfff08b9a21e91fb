"""Parallelism tests: mesh building, DP grad parity (see test_trainer), and
2-D data×model (TP output layer) parity vs single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.config import FbankOpts, FeatConfig, FrameOpts, MelOpts, ModelConfig, OptimizerConfig
from pykaldi2_tpu.data.dataloader import ChunkDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.parallel.mesh import make_mesh
from pykaldi2_tpu.parallel.tensor_parallel import make_ce_train_step_2d, shard_params, _opt_specs
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.trainer import make_ce_train_step
from pykaldi2_tpu.utils import make_optimizer
from jax.sharding import NamedSharding, PartitionSpec as P

from toydata import make_toy_corpus


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.axis_names == ("data",) and m.size == 8
    m2 = make_mesh({"data": 4, "model": 2})
    assert m2.devices.shape == (4, 2)
    m3 = make_mesh({"data": -1, "model": 2})
    assert m3.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_tp2d_matches_single_device(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=8, num_pdfs=6, seed=0)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    mcfg = ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=16, num_layers=1,
                       output_size=6, compute_dtype="float32")
    model = build_model(mcfg)
    # SGD for strict parity: adam's rsqrt amplifies fp32 reduction-order noise
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=0.05, grad_clip=1.0))
    opt_noclip = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=0.05, grad_clip=0.0))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    loader = ChunkDataloader(ds, batch_size=4, chunk_len=40, shuffle=False)
    batch = next(iter(loader))

    single = make_ce_train_step(model, feat_fn, opt, mesh=None, donate=False)
    p1, o1, m1 = single(params, opt_state, batch, jax.random.PRNGKey(3))

    mesh = make_mesh({"data": 4, "model": 2})
    tp_step = make_ce_train_step_2d(model, feat_fn, opt_noclip, mesh, donate=False, grad_clip=1.0)
    sp = shard_params(params, mesh)
    opt_state_nc = opt_noclip.init(params)
    so = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state_nc, _opt_specs(opt_state_nc, params),
        is_leaf=lambda x: isinstance(x, P),
    )
    sb = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    p2, o2, m2 = tp_step(sp, so, sb, jax.random.PRNGKey(3))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert float(m1["frame_acc"]) == pytest.approx(float(m2["frame_acc"]), abs=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6)


def test_se_dp_step_matches_single_device(tmp_path):
    """BASELINE config #5: multi-chip DP MMI == single-device math."""
    from pykaldi2_tpu.data.dataloader import BucketSpec, SeqDataloader
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, estimate_phone_bigram
    from pykaldi2_tpu.graph.phone_lm import collapse_to_phones
    from pykaldi2_tpu.ops.fb_bigram import make_bigram_den
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.ops.se_losses import count_labels, priors_from_counts

    num_pdfs = 4
    paths = make_toy_corpus(str(tmp_path), num_utts=8, num_pdfs=num_pdfs, seed=22)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=16,
                                    num_layers=1, output_size=num_pdfs, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=0.01, grad_clip=5.0))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    tm = TransitionModel(HmmTopology.one_state(range(1, num_pdfs + 1)))
    pdf_to_phone = np.array([p for (p, _j, _pdf) in tm.tuples], np.int32)
    lm = estimate_phone_bigram(
        [collapse_to_phones(pdf_to_phone[l]) for l in ds.labels.values()], tm.topo.phones)
    den = make_bigram_den(tm, lm)
    prior = priors_from_counts(count_labels(ds.labels.values(), num_pdfs))

    loader = SeqDataloader(ds, BucketSpec(boundaries=(256,), batch_sizes=8), shuffle=False)
    batch = next(iter(loader))
    batch.pop("utt_ids")

    kwargs = dict(log_prior=prior, acoustic_scale=1.0, ce_ratio=0.1)
    single = make_se_train_step(model, feat_fn, opt, den, "mmi", None, donate=False, **kwargs)
    mesh = make_mesh()
    dp = make_se_train_step(model, feat_fn, opt, den, "mmi", mesh, donate=False, **kwargs)
    key = jax.random.PRNGKey(3)
    p1, _, m1 = single(params, opt_state, batch, key)
    sharded = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    p2, _, m2 = dp(params, opt_state, sharded, key)
    assert abs(float(m1["objective"]) - float(m2["objective"])) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6)


def test_bf16_grad_compression_close_to_fp32():
    """Horovod-fp16-compression parity: bf16-compressed psum ~= exact psum."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.frontend.window import num_frames as _nf
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.parallel.mesh import make_mesh
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_ce_train_step
    from pykaldi2_tpu.utils import make_optimizer

    rng = np.random.RandomState(0)
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=16)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=16, num_layers=1, output_size=6,
                                    compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="sgd", lr=0.1))
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 8})
    B, S = 8, 3000
    T = _nf(S, FrameOpts(dither=0.0))
    batch = {
        "wave": jnp.asarray((rng.randn(B, S) * 1000).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 6, (B, T)).astype(np.int32)),
        "mask": jnp.ones((B, T), jnp.float32),
    }
    outs = {}
    for comp in ("none", "bf16"):
        step = make_ce_train_step(model, feat_fn, opt, mesh, donate=False,
                                  grad_compression=comp)
        p2, _, m = step(params, opt.init(params), batch, jax.random.PRNGKey(1))
        outs[comp] = (p2, float(m["loss"]))
    assert outs["none"][1] == outs["bf16"][1]  # loss is pre-update, identical
    for a, b in zip(jax.tree.leaves(outs["none"][0]), jax.tree.leaves(outs["bf16"][0])):
        a, b = np.asarray(a), np.asarray(b)
        # updates differ only by bf16 rounding of gradients
        np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-3)


def test_pallas_lstm_inside_shard_map(tmp_path, monkeypatch):
    """Regression: pallas_call inside shard_map (the TPU mesh path) needs
    vma-typed out_shapes under replication tracking, operands pvaried to a
    common vma, and explicit weight-grad psums in the custom VJPs.

    Interpret-mode pallas cannot run under check_vma shard_map (upstream:
    the interpreter's internal dynamic_slice indices carry an empty vma), so
    this runs the real compiled kernels — TPU only; `bench.py --check`'s
    ce_mesh floor covers it every round on the chip.
    """
    if jax.default_backend() != "tpu":
        pytest.skip("compiled pallas-in-shard_map needs the TPU backend "
                    "(interpret mode hits an upstream vma limitation)")
    monkeypatch.setenv("PK2_PALLAS_LSTM", "1")

    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    # h=128 (lane-aligned) and local per-device batch 64/8 = 8 (8-sublane)
    # so the Pallas path is actually taken inside each shard
    mcfg = ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=128,
                       num_layers=1, output_size=6, compute_dtype="float32")
    model = build_model(mcfg)
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=0.05))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    from pykaldi2_tpu.data.dataloader import chunk_samples

    chunk = 24
    S = chunk_samples(chunk, feat_cfg.fbank.frame_opts)
    rng = np.random.RandomState(4)
    batch = {
        "wave": (rng.randn(64, S) * 4000).astype(np.float32),
        "labels": rng.randint(0, 6, (64, chunk)).astype(np.int32),
        "mask": np.ones((64, chunk), np.float32),
    }

    from pykaldi2_tpu.ops import lstm_pallas
    assert lstm_pallas.supported(8, 128)  # local per-device batch

    mesh = make_mesh({"data": 8})
    step = make_ce_train_step(model, feat_fn, opt, mesh=mesh, donate=False)
    p, o, m = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # parity vs the scan path under the same mesh
    monkeypatch.setenv("PK2_PALLAS_LSTM", "0")
    step2 = make_ce_train_step(model, feat_fn, opt, mesh=mesh, donate=False)
    p2, o2, m2 = step2(params, opt_state, batch, jax.random.PRNGKey(1))
    assert abs(float(m["loss"]) - float(m2["loss"])) < 5e-3
