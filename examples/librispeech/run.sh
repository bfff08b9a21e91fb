#!/usr/bin/env bash
# LibriSpeech recipe runner (PyKaldi2-style stages). Assumes data prep done:
#   data/train_960/{wav.scp,text}, data/dev_clean/{wav.scp,text},
#   lexicon.txt (word phone1 phone2 ...), and either imported pdf alignments
#   at exp/ali/ali.ark or a seed model to bootstrap them (stage 0).
set -euo pipefail

stage=${1:-1}
cd "$(dirname "$0")"

if [ "$stage" -le 0 ]; then
  echo "=== stage 0: bootstrap alignments with a seed model ==="
  python -m pykaldi2_tpu.bin.align -config ce.yaml -data data.yaml \
    -model exp/seed/model.latest.npz -text data/train_960/text \
    -lexicon lexicon.txt -out exp/ali/ali.ark
fi

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: global CMVN stats ==="
  python -m pykaldi2_tpu.bin.compute_cmvn_stats -data data.yaml -output exp/cmvn.stats
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2: CE training ==="
  python -m pykaldi2_tpu.bin.train_ce -config ce.yaml -data data.yaml \
    -cv_data data_dev.yaml -exp_dir exp/ce
  # pdf priors from the alignments (for SE training and decoding)
  python -m pykaldi2_tpu.bin.compute_priors -ali exp/ali/ali.ark \
    -out exp/prior.npy
fi

if [ "$stage" -le 3 ]; then
  echo "=== stage 3: sequence training (MMI, fixed den graph) ==="
  ce_final=$(ls -v exp/ce/model.*.npz | tail -1)
  python -m pykaldi2_tpu.bin.train_se -config se.yaml -data data.yaml \
    -exp_dir exp/se_mmi -seed_model "$ce_final" -criterion mmi
  # reference-style on-the-fly denominator lattices instead (the beam
  # search runs ON the TPU; -decoder host uses the native C++ decoder):
  #   ... -on_the_fly -decoder device -beam 16 -lattice_beam 8
  # sMBR: ... -criterion smbr ; MPE: ... -criterion mpfe
fi

if [ "$stage" -le 4 ]; then
  echo "=== stage 4: build decode graph ==="
  # word-LM HCLG (recommended: real eval decodes against an ARPA LM):
  #   lm.arpa = a trigram LM over the training text (external, or
  #   python -c "from pykaldi2_tpu.graph.arpa import train_arpa; ...")
  if [ -f lm.arpa ]; then
    python -m pykaldi2_tpu.bin.build_graph decode -lexicon lexicon.txt \
      -arpa lm.arpa -out exp/hclg.npz -words_out exp/words.txt \
      -sil_phone 1 -sil_prob 0.5
  else
    # fallback: free word-loop graph (no LM)
    python -m pykaldi2_tpu.bin.build_graph decode -lexicon lexicon.txt \
      -out exp/graph.fst.txt -words_out exp/words.txt -sil_phone 1 -sil_prob 0.5
  fi
fi

if [ "$stage" -le 5 ]; then
  echo "=== stage 5: decode + WER ==="
  se_final=$(ls -v exp/se_mmi/model.*.npz | tail -1)
  python -m pykaldi2_tpu.bin.decode -config ce.yaml -data data_dev.yaml \
    -model "$se_final" -graph "$([ -f exp/hclg.npz ] && echo exp/hclg.npz || echo exp/graph.fst.txt)" -words exp/words.txt \
    -ref data/dev_clean/text -acoustic_scale 0.1 -prior exp/prior.npy \
    -hyp_out exp/dev_clean.hyp -dump_ark exp/dev_clean.post.ark \
    -lattice_out exp/dev_clean.lat.ark -oracle
  # extras on the dumped lattices (Kaldi lattice-* equivalents):
  #   N-best:    python -m pykaldi2_tpu.bin.lattice_tool -lattices exp/dev_clean.lat.ark \
  #                -words exp/words.txt -nbest 10 -nbest_out exp/dev_clean.nbest
  #   rescoring: ... -arpa_old lm.arpa -arpa_new lm4.arpa -lm_scale 1.0 \
  #                -rescored_out exp/dev_clean.lat4.ark -ref data/dev_clean/text
  #   consensus: add -mbr -ctm_out exp/dev_clean.ctm to the decode above
  #              (MBR transcripts + per-word confidences/times)
  #   lm sweep:  add -lm_scale_sweep 5:17 to the decode above (WER per LM
  #              weight, Kaldi scoring-script style; no re-decode)
  #   pruning:   lattice_tool ... -prune_beam 4 -pruned_out exp/dev_clean.latp.ark
fi
