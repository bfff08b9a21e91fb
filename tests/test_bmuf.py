"""BMUF distributed mode: divergent workers + block-momentum sync."""

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                 ModelConfig, OptimizerConfig)
from pykaldi2_tpu.data.dataloader import ChunkDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.parallel.bmuf import bmuf_init, make_bmuf_local_step, make_bmuf_sync
from pykaldi2_tpu.parallel.mesh import local_batch_sharding, make_mesh
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.trainer import make_ce_train_step
from pykaldi2_tpu.utils import make_optimizer
from jax.sharding import NamedSharding, PartitionSpec as P

from toydata import make_toy_corpus


def test_bmuf_block_training(tmp_path):
    paths = make_toy_corpus(str(tmp_path), num_utts=8, num_pdfs=4, seed=9)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"], frame_opts=FrameOpts(dither=0.0))
    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=24)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim, hidden_size=16,
                                    num_layers=1, output_size=4, compute_dtype="float32"))
    opt = make_optimizer(OptimizerConfig(type="adam", lr=5e-3))
    params = model.init(jax.random.PRNGKey(0))

    mesh = make_mesh()
    local = make_ce_train_step(model, feat_fn, opt, mesh=None, donate=False)
    bm_step = make_bmuf_local_step(local, mesh)
    sync = make_bmuf_sync(mesh)

    worker, state = bmuf_init(params, mesh, block_momentum=0.5, block_lr=1.0)
    n = mesh.shape["data"]
    worker_opt = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (n,) + np.shape(x)),
                              opt.init(params))
    worker_opt = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), worker_opt)

    key = jax.random.PRNGKey(1)
    losses = []
    for block in range(6):
        loader = ChunkDataloader(ds, batch_size=8, chunk_len=40, seed=3)
        loader.set_epoch(block)
        for batch in loader:
            sb = {k: jax.device_put(v, local_batch_sharding(mesh)) for k, v in batch.items()}
            key, sk = jax.random.split(key)
            worker, worker_opt, m = bm_step(worker, worker_opt, sb, sk)
            losses.append(float(m["loss"]))
        # workers have diverged within the block
        w0 = jax.tree.leaves(worker)[0]
        assert not np.allclose(np.asarray(w0[0]), np.asarray(w0[1]))
        worker, state = sync(worker, state)
        # after sync every worker holds the same params again
        w0 = jax.tree.leaves(worker)[0]
        np.testing.assert_allclose(np.asarray(w0[0]), np.asarray(w0[-1]), rtol=1e-6)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
