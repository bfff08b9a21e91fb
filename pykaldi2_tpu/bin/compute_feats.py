"""Dump base features for a corpus to a Kaldi ark(+scp).

Reference behavior: ``compute-fbank-feats`` / ``compute-mfcc-feats``
(kaldi/src/featbin/, SURVEY.md §3.2 "Kaldi feature extraction") as driven by
recipe data-prep scripts — raw per-utterance feature matrices, BEFORE
CMVN/deltas/splicing (those are applied downstream by apply-cmvn / the
training pipeline, exactly as here: FeaturePipeline applies them on top of
``feats`` batches).  The emitted ark+scp feeds this framework's own
``feats_scp`` corpus mode or any Kaldi consumer.

Waveforms are bucketed to power-of-two sample lengths so the jitted
extractor compiles O(log max_len) programs instead of one per distinct
utterance length; trailing frames of the padding are sliced off (framing
of frame t only reads samples inside its window, so padded extraction
matches unpadded up to fp32 reduction-order noise, ~1e-5).
"""

from __future__ import annotations

import argparse
import copy

import jax
import jax.numpy as jnp
import numpy as np

from pykaldi2_tpu.config import load_data_config
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.dataset import SpeechDataset


def main(argv=None):
    from pykaldi2_tpu.utils import apply_platform_env, setup_logging

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("-data", required=True,
                   help="corpus YAML (wav_scp + feat config)")
    p.add_argument("-out", required=True,
                   help="output ark path; an .scp index is written next to it")
    p.add_argument("-dither", type=float, default=None,
                   help="override frame dither (default: config value; "
                        "Kaldi recipes usually keep dither for training "
                        "features and disable it for parity checks)")
    p.add_argument("-seed", type=int, default=0, help="dither PRNG seed")
    p.add_argument("-compress", action="store_true",
                   help="write Kaldi CompressedMatrix records (the "
                        "--compress=true default of Kaldi feature pipelines: "
                        "percentile-coded CM, ~4x smaller arks)")
    args = p.parse_args(argv)
    log = setup_logging(None)

    cfg = load_data_config(args.data)
    if args.dither is not None:
        cfg.feat.fbank.frame_opts.dither = args.dither
        cfg.feat.mfcc.frame_opts.dither = args.dither
    ds = SpeechDataset.from_config(cfg)
    if ds.mode != "wave":
        raise SystemExit("compute_feats needs a waveform corpus (wav_scp)")

    # base features only: strip CMVN/deltas/splice like compute-fbank-feats
    # (compute_cmvn_stats.py strips the same way), keep per-utt VTLN warps
    from pykaldi2_tpu.pipeline import FeaturePipeline

    base_cfg = copy.deepcopy(cfg.feat)
    base_cfg.cmvn.norm_means = False
    base_cfg.cmvn.stats_path = None
    base_cfg.cmvn.utt2spk = None
    base_cfg.cmvn.spk_stats_scp = None
    base_cfg.delta_order = 0
    base_cfg.splice_left = base_cfg.splice_right = 0
    pipe = FeaturePipeline(base_cfg)
    fn = jax.jit(lambda b, k: pipe(b, dither_key=k))

    key = jax.random.PRNGKey(args.seed)
    scp = args.out + ".scp" if not args.out.endswith(".ark") \
        else args.out[:-4] + ".scp"
    n = 0
    kind = "cmat" if args.compress else "mat"
    with kaldi_io.ArkWriter(args.out, scp, kind=kind) as w:
        for uid in ds.utt_ids:
            utt = ds.get(uid)
            nf = utt.num_frames
            if nf <= 0:
                log.warning("skipping empty utterance %s", uid)
                continue
            s_pad = 1 << int(np.ceil(np.log2(max(len(utt.wave), 2))))
            wave = np.zeros(s_pad, np.float32)
            wave[: len(utt.wave)] = utt.wave
            batch = {"wave": jnp.asarray(wave[None])}
            if pipe.has_extras:
                batch.update({k2: jnp.asarray(v) for k2, v in
                              pipe.batch_extras([uid]).items()})
            key, sub = jax.random.split(key)
            feats = np.asarray(fn(batch, sub))[0, :nf]
            w.write(uid, feats.astype(np.float32))
            n += 1
    log.info("wrote %d feature matrices (%d-dim %s) to %s (+.scp)",
             n, pipe.dim, base_cfg.type, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
