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

from pykaldi2_tpu.frontend.cmvn import acc_cmvn_stats
from pykaldi2_tpu.pipeline import save_cmvn_stats


def main(argv=None):
    from pykaldi2_tpu.utils import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("-data", required=True, help="corpus YAML (wav_scp/feats + feat config)")
    p.add_argument("-output", required=True, help="output stats file (Kaldi binary matrix)")
    p.add_argument("-spk2utt", default=None,
                   help="'spk utt1 utt2 ...' table → per-speaker stats ark+scp "
                        "at -output(.scp) instead of one global matrix "
                        "(compute-cmvn-stats --spk2utt semantics)")
    args = p.parse_args(argv)
    cfg = load_data_config(args.data)
    # stats are computed deterministically (dither off)
    cfg.feat.fbank.frame_opts.dither = 0.0
    cfg.feat.mfcc.frame_opts.dither = 0.0
    ds = SpeechDataset.from_config(cfg)
    stats = None
    if ds.mode == "wave":
        # stats must describe the features CMVN will actually normalize: the
        # BASE features (pre-deltas/splice) including per-utterance VTLN
        # warps when configured (Kaldi computes CMVN post-VTLN too)
        import copy

        from pykaldi2_tpu.pipeline import FeaturePipeline

        stats_cfg = copy.deepcopy(cfg.feat)
        stats_cfg.cmvn.norm_means = False
        stats_cfg.cmvn.stats_path = None
        stats_cfg.cmvn.utt2spk = None
        stats_cfg.cmvn.spk_stats_scp = None
        stats_cfg.delta_order = 0
        stats_cfg.splice_left = stats_cfg.splice_right = 0
        pipe = FeaturePipeline(stats_cfg)
        fn = jax.jit(lambda b: pipe(b))

    def utt_feats(uid):
        utt = ds.get(uid)
        if ds.mode == "feats":
            return utt.feats
        batch = {"wave": jnp.asarray(utt.wave[None])}
        if pipe.has_extras:
            batch.update({k: jnp.asarray(v)
                          for k, v in pipe.batch_extras([uid]).items()})
        return np.asarray(fn(batch))[0]

    if args.spk2utt:
        from pykaldi2_tpu.data import kaldi_io

        spk2utt = {}
        with open(args.spk2utt) as f:
            for line in f:
                parts = line.split()
                if parts:
                    spk2utt[parts[0]] = parts[1:]
        known = set(ds.utt_ids)
        n_spk = 0
        with kaldi_io.ArkWriter(args.output, args.output + ".scp", kind="mat") as w:
            for spk, utts in spk2utt.items():
                stats = None
                for uid in utts:
                    if uid in known:
                        stats = acc_cmvn_stats(utt_feats(uid), stats)
                if stats is not None:
                    w.write(spk, stats)
                    n_spk += 1
        print(f"wrote {args.output}(.scp): per-speaker stats for {n_spk} speakers")
        return 0

    for uid in ds.utt_ids:
        stats = acc_cmvn_stats(utt_feats(uid), stats)
    save_cmvn_stats(args.output, stats)
    d = stats.shape[1] - 1
    print(f"wrote {args.output}: {int(stats[0, d])} frames, dim {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
