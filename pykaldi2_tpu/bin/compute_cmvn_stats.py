"""Accumulate global CMVN stats over a corpus (compute-cmvn-stats equivalent).

Reference behavior: kaldi featbin/compute-cmvn-stats.cc driven by recipe
scripts (SURVEY.md §3.2 "Kaldi CMVN"). Features are computed with the same
FeatConfig the trainer will use (minus CMVN/deltas/splice, which come after).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pykaldi2_tpu.config import load_data_config
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.frontend import compute_fbank, compute_mfcc
from pykaldi2_tpu.frontend.cmvn import acc_cmvn_stats
from pykaldi2_tpu.pipeline import save_cmvn_stats


def main(argv=None):
    from pykaldi2_tpu.utils import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("-data", required=True, help="corpus YAML (wav_scp/feats + feat config)")
    p.add_argument("-output", required=True, help="output stats file (Kaldi binary matrix)")
    args = p.parse_args(argv)
    cfg = load_data_config(args.data)
    # stats are computed deterministically (dither off)
    cfg.feat.fbank.frame_opts.dither = 0.0
    cfg.feat.mfcc.frame_opts.dither = 0.0
    ds = SpeechDataset.from_config(cfg)
    stats = None
    if ds.mode == "wave":
        if cfg.feat.type == "fbank":
            fn = jax.jit(lambda w: compute_fbank(w, cfg.feat.fbank))
        else:
            fn = jax.jit(lambda w: compute_mfcc(w, cfg.feat.mfcc))
    for uid in ds.utt_ids:
        utt = ds.get(uid)
        feats = utt.feats if ds.mode == "feats" else np.asarray(fn(jnp.asarray(utt.wave)))
        stats = acc_cmvn_stats(feats, stats)
    save_cmvn_stats(args.output, stats)
    d = stats.shape[1] - 1
    print(f"wrote {args.output}: {int(stats[0, d])} frames, dim {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
