"""End-to-end CE training tests: loss decreases, DP == single-device, CLI, resume.

BASELINE.json config #1 (CE on a small corpus, CPU single worker) and #5
(DP grad parity, SURVEY.md §5 "Distributed without a cluster").
"""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.config import Config, DataConfig, FeatConfig, FbankOpts, FrameOpts, MelOpts, ModelConfig, OptimizerConfig
from pykaldi2_tpu.data.dataloader import ChunkDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.parallel.mesh import local_batch_sharding, make_mesh
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.trainer import make_ce_train_step, make_eval_step
from pykaldi2_tpu.utils import make_optimizer, save_checkpoint, load_checkpoint
from pykaldi2_tpu.utils.lr import PlateauAnnealer, set_lr_scale

from toydata import make_toy_corpus


def _small_feat_cfg():
    return FeatConfig(
        fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)),
    )


def _setup(tmp_path, num_utts=6, num_pdfs=4):
    paths = make_toy_corpus(str(tmp_path), num_utts=num_utts, num_pdfs=num_pdfs, seed=0)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = _small_feat_cfg()
    feat_fn = FeaturePipeline(feat_cfg)
    mcfg = ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=24, num_layers=1,
                       output_size=num_pdfs, compute_dtype="float32")
    model = build_model(mcfg)
    return ds, feat_fn, model, paths


def test_ce_training_reduces_loss(tmp_path):
    ds, feat_fn, model, _ = _setup(tmp_path)
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-2, grad_clip=5.0))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_ce_train_step(model, feat_fn, opt, mesh=None)
    key = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(15):
        loader = ChunkDataloader(ds, batch_size=8, chunk_len=40, seed=1)
        loader.set_epoch(epoch)
        for batch in loader:
            batch.pop("utt_ids", None)
            key, sk = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, sk)
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert float(m["frame_acc"]) > 0.5


def test_dp_step_matches_single_device(tmp_path):
    ds, feat_fn, model, _ = _setup(tmp_path, num_utts=8)
    opt = make_optimizer(OptimizerConfig(type="sgd", lr=0.05, grad_clip=0.0))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    loader = ChunkDataloader(ds, batch_size=8, chunk_len=40, shuffle=False)
    batch = next(iter(loader))

    single = make_ce_train_step(model, feat_fn, opt, mesh=None, donate=False)
    mesh = make_mesh()  # 8 fake CPU devices
    assert mesh.size == 8
    dp = make_ce_train_step(model, feat_fn, opt, mesh=mesh, donate=False)

    key = jax.random.PRNGKey(7)
    p1, _, m1 = single(params, opt_state, batch, key)
    sharded = {k: jax.device_put(v, local_batch_sharding(mesh)) for k, v in batch.items()}
    p2, _, m2 = dp(params, opt_state, sharded, key)
    # dropout/dither keys differ per shard, but both are disabled here → exact math parity
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert float(m1["frames"]) == float(m2["frames"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_eval_step_and_plateau_anneal(tmp_path):
    ds, feat_fn, model, _ = _setup(tmp_path)
    opt = make_optimizer(OptimizerConfig(type="sgd", lr=0.1))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    ev = make_eval_step(model, feat_fn)
    loader = ChunkDataloader(ds, batch_size=4, chunk_len=40, shuffle=False)
    batch = next(iter(loader))
    nll, cnt, cor = ev(params, batch)
    assert float(cnt) > 0 and np.isfinite(float(nll))
    ann = PlateauAnnealer(factor=0.5, patience=1)
    assert ann.step(1.0) == 1.0
    assert ann.step(1.1) == 0.5     # no improvement → halve
    opt_state = set_lr_scale(opt_state, 0.5)
    assert float(opt_state[-1].hyperparams["lr_scale"]) == 0.5


def test_checkpoint_roundtrip_with_optstate(tmp_path):
    ds, feat_fn, model, _ = _setup(tmp_path)
    opt = make_optimizer(OptimizerConfig(type="adam", lr=1e-3))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_ce_train_step(model, feat_fn, opt, mesh=None, donate=False)
    loader = ChunkDataloader(ds, batch_size=4, chunk_len=40, shuffle=False)
    batch = next(iter(loader))
    params, opt_state, _ = step(params, opt_state, batch, jax.random.PRNGKey(2))
    p = str(tmp_path / "ck" / "model.0.npz")
    save_checkpoint(p, params, opt_state, {"epoch": 0, "loss": 1.23})
    p2, o2, meta = load_checkpoint(p, model.init(jax.random.PRNGKey(9)), opt.init(model.init(jax.random.PRNGKey(9))))
    assert meta["epoch"] == 0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_ce_cli(tmp_path):
    import yaml
    paths = make_toy_corpus(str(tmp_path / "corpus"), num_utts=4, num_pdfs=4, seed=2)
    data_yaml = {
        "wav_scp": paths["wav_scp"],
        "label_ark": paths["ali"],
        "feat": {"fbank": {"frame_opts": {"dither": 0.0}, "mel_opts": {"num_bins": 24}}},
    }
    cfg_yaml = {
        "model": {"type": "lstm", "hidden_size": 16, "num_layers": 1,
                  "output_size": 4, "compute_dtype": "float32"},
        "optimizer": {"type": "adam", "lr": 0.002},
        "trainer": {"batch_size": 4, "chunk_len": 40, "num_epochs": 2, "log_interval": 1},
    }
    dp, cp = str(tmp_path / "data.yaml"), str(tmp_path / "exp.yaml")
    with open(dp, "w") as f:
        yaml.dump(data_yaml, f)
    with open(cp, "w") as f:
        yaml.dump(cfg_yaml, f)
    exp = str(tmp_path / "exp")

    from pykaldi2_tpu.bin.train_ce import main
    assert main(["-config", cp, "-data", dp, "-exp_dir", exp, "-single_device"]) == 0
    assert os.path.exists(os.path.join(exp, "model.1.npz"))
    lines = [json.loads(l) for l in open(os.path.join(exp, "metrics.jsonl"))]
    ep = [l for l in lines if "epoch_loss" in l]
    assert len(ep) == 2 and ep[1]["epoch_loss"] < ep[0]["epoch_loss"] * 1.05

    # resume from latest checkpoint: trains epoch 2 only if num_epochs bumped
    assert main(["-config", cp, "-data", dp, "-exp_dir", exp, "-single_device",
                 "-num_epochs", "3"]) == 0
    assert os.path.exists(os.path.join(exp, "model.2.npz"))


def test_train_ce_cli_with_cv(tmp_path):
    import yaml
    paths = make_toy_corpus(str(tmp_path / "corpus"), num_utts=6, num_pdfs=4, seed=21)
    data_yaml = {"wav_scp": paths["wav_scp"], "label_ark": paths["ali"],
                 "feat": {"fbank": {"frame_opts": {"dither": 0.0}, "mel_opts": {"num_bins": 24}}}}
    cfg_yaml = {"model": {"type": "lstm", "hidden_size": 16, "num_layers": 1,
                          "output_size": 4, "compute_dtype": "float32"},
                "optimizer": {"type": "adam", "lr": 0.002},
                "trainer": {"batch_size": 4, "chunk_len": 40, "num_epochs": 2, "log_interval": 5}}
    dp, cp = str(tmp_path / "data.yaml"), str(tmp_path / "exp.yaml")
    yaml.dump(data_yaml, open(dp, "w"))
    yaml.dump(cfg_yaml, open(cp, "w"))
    exp = str(tmp_path / "exp")
    from pykaldi2_tpu.bin.train_ce import main
    assert main(["-config", cp, "-data", dp, "-cv_data", dp, "-exp_dir", exp,
                 "-single_device"]) == 0
    lines = [json.loads(l) for l in open(os.path.join(exp, "metrics.jsonl"))]
    assert sum(1 for l in lines if "cv_loss" in l) == 2


def test_decoder_word_penalty(tmp_path):
    from pykaldi2_tpu.decode import LatticeDecoder
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel, make_decode_graph
    tm = TransitionModel(HmmTopology.one_state([1, 2]))
    lexicon = {"a": [[1]], "b": [[2]]}
    word_ids = {"a": 1, "b": 2}
    g = make_decode_graph(tm, lexicon, word_ids)
    obs = np.full((6, 2), -1.0, np.float32)
    obs[:, 0] = -0.9  # slight preference for pdf 0 every frame
    w0, _, _ = LatticeDecoder(g, beam=32.0).decode(obs)
    wp, _, _ = LatticeDecoder(g, beam=32.0, word_penalty=3.0).decode(obs)
    # heavy insertion penalty favors fewer words (longer phones per word)
    assert len(wp) <= len(w0)


def test_metrics_logger_tensorboard(tmp_path):
    """Optional TensorBoard mirror (SURVEY §6.5) writes event files."""
    pytest.importorskip("torch.utils.tensorboard")
    import os as _os

    from pykaldi2_tpu.utils.logging import MetricsLogger

    ml = MetricsLogger(str(tmp_path), rank=0, tensorboard=True)
    ml.log(step=0, loss=2.5, frame_acc=0.1)
    ml.log(step=1, loss=2.0, frame_acc=0.2)
    ml.close()
    tb_dir = tmp_path / "tb"
    events = [p for p in _os.listdir(tb_dir) if "tfevents" in p]
    assert events, "no event files written"
    # JSONL still written alongside
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    # rank!=0 and tensorboard off: no-op
    ml2 = MetricsLogger(str(tmp_path / "r1"), rank=1, tensorboard=True)
    ml2.log(loss=1.0)
    ml2.close()
    assert not (tmp_path / "r1").exists()
