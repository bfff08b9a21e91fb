"""Forced alignment: on-device Viterbi over per-utterance numerator graphs.

Replaces Kaldi's align-mapped/gmm-align pipeline for generating frame-level
pdf alignments (the labels train_ce/train_se consume) — making the framework
self-contained: given transcripts + a lexicon (or per-utt phone sequences),
it writes an alignment ark of pdf-ids.

CLI: python -m pykaldi2_tpu.bin.align -config exp.yaml -data data.yaml \
       -model ckpt.npz -text text.txt -lexicon lexicon.txt -out ali.ark
lexicon.txt: "word phone1 phone2 ..." (phone ids, 1-based) per line;
text.txt: "utt_id word1 word2 ..." per line.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pykaldi2_tpu.config import load_config, load_data_config
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.graph import HmmTopology, TransitionModel
from pykaldi2_tpu.graph.compile import make_num_graph
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.ops.fb import fsa_viterbi, pack_graph
from pykaldi2_tpu.ops.fb_batched import pack_graph_batch
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.utils import load_checkpoint, setup_logging


def read_lexicon(path: str):
    lexicon, word_ids = {}, {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            word = parts[0]
            pron = [int(p) for p in parts[1:]]
            lexicon.setdefault(word, []).append(pron)
            if word not in word_ids:
                word_ids[word] = len(word_ids) + 1
    return lexicon, word_ids


def main(argv=None):
    from pykaldi2_tpu.utils import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("-config", required=True)
    p.add_argument("-data", required=True)
    p.add_argument("-model", required=True)
    p.add_argument("-text", required=True)
    p.add_argument("-lexicon", required=True)
    p.add_argument("-out", required=True, help="output alignment ark (pdf-ids)")
    p.add_argument("-trans_model", default=None)
    p.add_argument("-acoustic_scale", type=float, default=1.0)
    p.add_argument("-sil_phone", type=int, default=0)
    p.add_argument("-sil_prob", type=float, default=0.0)
    args = p.parse_args(argv)

    log = setup_logging(None)
    cfg = load_config(args.config)
    cfg.data = load_data_config(args.data)
    cfg.data.label_ark = None  # aligning: no labels yet
    dataset = SpeechDataset.from_config(cfg.data)
    feat_fn = FeaturePipeline(cfg.data.feat).for_eval()
    cfg.model.input_size = feat_fn.dim
    model = build_model(cfg.model)
    params, _, _ = load_checkpoint(args.model, model.init(jax.random.PRNGKey(0)))

    lexicon, word_ids = read_lexicon(args.lexicon)
    if args.trans_model:
        tm = TransitionModel.read_kaldi(args.trans_model)
    else:
        phones = sorted({ph for prons in lexicon.values() for pron in prons for ph in pron}
                        | ({args.sil_phone} if args.sil_phone else set()))
        tm = TransitionModel(HmmTopology.one_state(phones))

    texts = {}
    with open(args.text) as f:
        for line in f:
            parts = line.split()
            if parts:
                texts[parts[0]] = parts[1:]

    @jax.jit
    def forward(wave, mask):
        feats = feat_fn({"wave": wave, "mask": mask})
        logits = model.apply(params, feats, mask)
        return args.acoustic_scale * jax.nn.log_softmax(logits.astype(jnp.float32), -1)

    def bucket(n, lo=64):
        while lo < n:
            lo *= 2
        return lo

    n_done = n_fail = 0
    with kaldi_io.ArkWriter(args.out, kind="ivec") as w:
        for uid in dataset.utt_ids:
            if uid not in texts:
                continue
            utt = dataset.get(uid)
            graph = make_num_graph(tm, texts[uid], lexicon, word_ids,
                                   args.sil_phone, args.sil_prob)
            # pad graph + time to power-of-two buckets to bound recompiles
            graph = graph.pad_to(bucket(graph.num_arcs), bucket(graph.num_states))
            t_pad = bucket(utt.num_frames, 128)
            wave_pad = np.zeros((1, (t_pad - 1) * dataset.frame_opts.window_shift
                                 + dataset.frame_opts.window_size), np.float32)
            wave_pad[0, : utt.wave.shape[0]] = utt.wave[: wave_pad.shape[1]]
            mask = np.zeros((1, t_pad), np.float32)
            mask[0, : utt.num_frames] = 1.0
            obs = forward(jnp.asarray(wave_pad), jnp.asarray(mask))
            packed = pack_graph(graph)
            score, arcs = fsa_viterbi(obs, packed, jnp.asarray([utt.num_frames]))
            # dead paths score ~NEG_INF (=-1e30, finite) and NaNs fail any
            # comparison — accept only clearly-live scores
            if not (float(score[0]) > -1e29):
                log.warning("alignment failed for %s (transcript too long for audio?)", uid)
                n_fail += 1
                continue
            pdfs = np.asarray(packed.pdf)[np.asarray(arcs)[0, : utt.num_frames]]
            w.write(uid, pdfs.astype(np.int32))
            n_done += 1
    log.info("aligned %d utterances (%d failed) → %s", n_done, n_fail, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
