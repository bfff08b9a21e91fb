import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import yaml

import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import load_config
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.data.dataloader import BucketSpec, SeqDataloader
from pykaldi2_tpu.decode.device_lattice import (pack_decode_graph,
                                                device_lattice_generate)
from pykaldi2_tpu.graph.vfst import VectorFst
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.ops.fb import NEG_INF
from pykaldi2_tpu.utils.checkpoint import load_checkpoint

from pykaldi2_tpu.config import load_data_config
cfg = load_config(".midscale5k/c.yaml")
cfg.data = load_data_config(".dbg/d_fail.yaml")
feat_fn = FeaturePipeline(cfg.data.feat).for_eval()
cfg.model.input_size = feat_fn.dim
model = build_model(cfg.model)
g = VectorFst.load(".midscale5k/hclg.npz")
graph = pack_decode_graph(g.to_fst() if hasattr(g, "to_fst") else g,
                          eps_mode="auto")
params, _, _ = load_checkpoint(".midscale5k/exp_se/model.0.npz",
                               model.init(jax.random.PRNGKey(0)))
ds = SpeechDataset.from_config(cfg.data)
loader = SeqDataloader(ds, BucketSpec(boundaries=(200, 400, 800, 1600, 3200),
                                      batch_sizes=8), shuffle=False,
                       extras_fn=(feat_fn.batch_extras
                                  if feat_fn.has_extras else None))
batch = next(iter(loader))
uids = batch.pop("utt_ids")
print("uids", uids)

@jax.jit
def forward(batch):
    feats = feat_fn(batch)
    logits = model.apply(params, feats, batch["mask"])
    return 0.1 * jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

obs = forward(batch)
nf = np.asarray(batch["num_frames"])
for lb in (8.0, 14.0):
    lat, scores, dropped = device_lattice_generate(
        obs, graph, batch["num_frames"], max_active=2048, max_arcs=4096,
        beam=14.0, lattice_beam=lb)
    src = np.asarray(lat.src); dst = np.asarray(lat.dst)
    w = np.asarray(lat.weight); fin = np.asarray(lat.final)
    B, T, A = src.shape; K = fin.shape[1]
    print(f"--- lattice_beam={lb}")
    for b in range(B):
        reach = np.zeros(K, bool); reach[0] = True
        break_t = -1
        for t in range(int(nf[b])):
            valid = w[b, t] > 0.5 * NEG_INF
            ok = valid & reach[src[b, t]]
            nxt = np.zeros(K, bool)
            np.maximum.at(nxt, dst[b, t][ok], True)
            if not nxt.any():
                break_t = t
                break
            reach = nxt
        n_fin = int((fin[b] > 0.5 * NEG_INF).sum())
        fin_reach = int(((fin[b] > 0.5 * NEG_INF) & reach).sum()) if break_t < 0 else 0
        print(f"  {uids[b]}: break_t={break_t}/{nf[b]} n_final_slots={n_fin} final_reachable={fin_reach} dropped={int(np.asarray(dropped)[b])}")
