"""Decode/eval entry point: posteriors → beam decode → WER.

Reference behavior: pykaldi2's decode/forward scripts + Kaldi
latgen-faster-mapped / compute-wer (SURVEY.md §4.4). Forward runs batched on
device (bucketed); decoding is either the host C++ decoder (default, any
graph scale) or — ``-decoder device`` — the batched on-accelerator lattice
search (decode/device_lattice.py), which never ships posteriors to the host
and feeds the same lattice scoring (N-best/oracle/MBR/sweeps).

CLI: python -m pykaldi2_tpu.bin.decode -config exp.yaml -data data.yaml \
       -model exp/ce/model.7.npz -graph graph.fst.txt -words words.txt \
       [-ref ref.txt] [-hyp_out hyp.txt] [-acoustic_scale 0.1] [-prior prior.npy]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pykaldi2_tpu.config import load_config, load_data_config
from pykaldi2_tpu.data.dataloader import BucketSpec, SeqDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.decode.decoder import LatticeDecoder
from pykaldi2_tpu.decode.wer import score_corpus
from pykaldi2_tpu.graph.fst import Fst
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.pipeline import FeaturePipeline
from pykaldi2_tpu.utils import load_checkpoint, setup_logging


def read_symtab(path: str):
    """OpenFst-style symbol table: 'word id' per line."""
    id2w = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                id2w[int(parts[1])] = parts[0]
    return id2w


def main(argv=None):
    from pykaldi2_tpu.utils import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("-config", required=True)
    p.add_argument("-data", required=True)
    p.add_argument("-model", required=True)
    p.add_argument("-graph", required=True, help="pdf-level decode FST (text format)")
    p.add_argument("-words", required=True, help="word symbol table")
    p.add_argument("-ref", default=None, help="reference transcripts (utt words...)")
    p.add_argument("-hyp_out", default=None)
    p.add_argument("-acoustic_scale", type=float, default=0.1)
    p.add_argument("-prior", default=None, help="log-prior .npy")
    p.add_argument("-beam", type=float, default=16.0)
    p.add_argument("-word_penalty", type=float, default=0.0)
    p.add_argument("-max_active", type=int, default=7000)
    p.add_argument("-on_device", action="store_true",
                   help="exact batched Viterbi decoding on the accelerator "
                        "(no host beam search); best for small/medium graphs")
    p.add_argument("-decoder", choices=("host", "device"), default="host",
                   help="'device' runs the batched beam-pruned lattice "
                        "search on the accelerator (decode/device_lattice) "
                        "and converts the banded lattices for scoring — all "
                        "lattice modes (-nbest/-oracle/-mbr/-lattice_out/"
                        "sweeps) work; set -max_active to frontier size "
                        "(e.g. 200-2000, NOT the host default 7000: it "
                        "shapes the dense per-frame band)")
    p.add_argument("-max_arcs", type=int, default=1024,
                   help="device decoder: lattice links kept per frame "
                        "(band cap; overflow drops the worst links and "
                        "warns)")
    p.add_argument("-num_threads", type=int, default=4,
                   help="parallel host decoding threads (ctypes releases the "
                        "GIL during the C++ search)")
    p.add_argument("-dump_ark", default=None,
                   help="also dump scaled pseudo-log-likelihood matrices to this "
                        "ark (+.scp) for external/Kaldi decoders")
    p.add_argument("-compress", action="store_true",
                   help="compress -dump_ark records (Kaldi CompressedMatrix)")
    p.add_argument("-lattice_beam", type=float, default=8.0,
                   help="lattice pruning beam (lattice modes only)")
    p.add_argument("-lattice_out", default=None,
                   help="write word lattices (Kaldi CompactLattice text "
                        "archive) to this path")
    p.add_argument("-nbest", type=int, default=0,
                   help="emit the N best unique word sequences per utterance")
    p.add_argument("-nbest_out", default=None,
                   help="N-best output path (default: stdout); lines are "
                        "'utt-N score word...'")
    p.add_argument("-oracle", action="store_true",
                   help="also report lattice oracle WER vs -ref "
                        "(Kaldi lattice-oracle)")
    p.add_argument("-mbr", action="store_true",
                   help="consensus (Minimum-Bayes-Risk) decoding: hypotheses "
                        "come from the lattice sausage argmax instead of the "
                        "best path (Kaldi lattice-mbr-decode)")
    p.add_argument("-ctm_out", default=None,
                   help="write a CTM with per-word times + MBR confidences "
                        "(Kaldi lattice-to-ctm-conf); implies -mbr")
    p.add_argument("-frame_shift", type=float, default=0.01,
                   help="seconds per frame for -ctm_out times")
    p.add_argument("-lm_scale_sweep", default=None,
                   help="'lo:hi[:step]' — score the lattices at each LM "
                        "(graph) scale and report WER per scale + the best "
                        "(Kaldi scoring-script lmwt sweep); needs -ref")
    args = p.parse_args(argv)
    if args.ctm_out:
        args.mbr = True
    sweep_scales = []
    if args.lm_scale_sweep:
        parts = [float(x) for x in args.lm_scale_sweep.split(":")]
        lo, hi = parts[0], parts[1]
        step_sz = parts[2] if len(parts) > 2 else 1.0
        s = lo
        while s <= hi + 1e-9:
            sweep_scales.append(round(s, 6))
            s += step_sz
        if not args.ref:
            raise SystemExit("-lm_scale_sweep needs -ref to score")

    log = setup_logging(None)
    cfg = load_config(args.config)
    cfg.data = load_data_config(args.data)
    dataset = SpeechDataset.from_config(cfg.data)
    feat_fn = FeaturePipeline(cfg.data.feat).for_eval()
    cfg.model.input_size = feat_fn.dim
    model = build_model(cfg.model)
    params, _, _ = load_checkpoint(args.model, model.init(jax.random.PRNGKey(0)))
    log_prior = np.load(args.prior) if args.prior else None

    if args.graph.endswith(".npz"):
        from pykaldi2_tpu.graph.vfst import VectorFst

        graph = VectorFst.load(args.graph)
    else:
        with open(args.graph, "rb") as gf:
            magic = gf.read(4)
        if magic == b"\xd6\xfd\xb2\x7e":  # OpenFst binary magic (LE 2125659606)
            from pykaldi2_tpu.graph.openfst_io import read_openfst

            graph = read_openfst(args.graph)
        else:
            graph = Fst.read_text(args.graph)
    dense_packed = None
    dev_graph = None
    decoders = []
    n_threads = max(args.num_threads, 1)
    lattice_mode = bool(args.lattice_out or args.nbest or args.oracle
                        or args.mbr or sweep_scales)
    if lattice_mode and args.on_device:
        raise SystemExit("-lattice_out/-nbest/-oracle/-mbr need a lattice "
                         "decoder; drop -on_device (or use -decoder device)")
    if args.on_device and args.decoder == "device":
        raise SystemExit("-on_device (exact Viterbi) and -decoder device "
                         "(beam-pruned lattice search) are different "
                         "accelerator paths; pick one")
    if args.oracle and not args.ref:
        raise SystemExit("-oracle needs -ref")
    if args.decoder == "device":
        from pykaldi2_tpu.decode.device_lattice import pack_decode_graph

        fstg = graph.to_fst() if hasattr(graph, "to_fst") else graph
        if not isinstance(fstg, Fst):
            raise SystemExit("-decoder device needs an Fst-convertible "
                             "graph (text / .npz / OpenFst binary)")
        try:
            # auto eps handling: in-frame closure when the eps subgraph
            # qualifies (backoff word-LM graphs — avoids the offline-fold
            # arc blowup, DESIGN.md §12), offline fold otherwise
            dev_graph = pack_decode_graph(fstg,
                                          word_penalty=args.word_penalty,
                                          eps_mode="auto")
        except ValueError as e:
            raise SystemExit(f"-decoder device cannot run this graph: {e}")
        if not dev_graph.has_olabels:
            raise SystemExit("-decoder device needs word output labels on "
                             "the decode graph")
        log.info("device decoding: %d states, buckets [%d x %d | %d x %d]",
                 dev_graph.num_states, dev_graph.s_lo, dev_graph.d_lo,
                 dev_graph.num_states - dev_graph.s_lo, dev_graph.d_hi)
    if args.on_device:
        if not isinstance(graph, Fst):
            raise SystemExit("-on_device needs a fully-emitting text graph "
                             "(eps-free); npz HCLG graphs are host-decoder only")
        from pykaldi2_tpu.decode.on_device import dense_from_pdf_fst
        from pykaldi2_tpu.ops.fb import pack_graph

        dense_packed = pack_graph(
            dense_from_pdf_fst(graph, word_penalty=args.word_penalty))
        log.info("on-device decoding: %d states, %d arcs",
                 dense_packed.num_states, int(dense_packed.src.shape[0]))
    elif dev_graph is None:
        # decoder handles are stateful — one per thread
        decoders = [LatticeDecoder(graph, beam=args.beam, max_active=args.max_active,
                                   lattice_beam=args.lattice_beam,
                                   word_penalty=args.word_penalty)
                    for _ in range(n_threads)]
    id2w = read_symtab(args.words)

    @jax.jit
    def forward(batch):
        feats = feat_fn(batch)
        logits = model.apply(params, feats, batch["mask"])
        logpost = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if log_prior is not None:
            logpost = logpost - jnp.asarray(log_prior)
        return args.acoustic_scale * logpost

    hyps = {}
    word_fsts = {}
    mbr_results = {}
    sweep_hyps = {}
    dump = None
    if args.dump_ark:
        from pykaldi2_tpu.data.kaldi_io import ArkWriter

        dump = ArkWriter(args.dump_ark, args.dump_ark + ".scp",
                         kind="cmat" if args.compress else "mat")
    loader = SeqDataloader(dataset, BucketSpec(boundaries=(200, 400, 800, 1600, 3200),
                                               batch_sizes=8), shuffle=False,
                           extras_fn=(feat_fn.batch_extras
                                      if feat_fn.has_extras else None))
    def host_side(utt_ids, obs, nf, dev_out, only=None):
        """Per-batch host post-processing: banded→FSA conversion (device
        mode) + lattice scoring/best-path. Device mode calls this one batch
        LATE — the search dispatch is async, so the chip runs batch i+1's
        search while the host converts and scores batch i (the first
        np.asarray on the search outputs is the sync point). ``only``
        restricts decoding to a subset of utt_ids (the wider-beam retry
        path) without touching already-recorded results."""
        pre = None
        if dev_out is not None:
            from pykaldi2_tpu.decode.device_lattice import banded_to_fsas

            lat_b, dropped, olab = dev_out
            n_drop = int(np.asarray(dropped).sum())
            if n_drop:
                log.warning("device search dropped %d lattice links to the "
                            "band cap; raise -max_arcs", n_drop)
            framed = banded_to_fsas(lat_b, np.asarray(nf), olabels=olab)
            pre = dict(zip(utt_ids, framed))

        def _decode_one(i_uid_dec):
            i, uid, dec = i_uid_dec
            try:
                if lattice_mode or pre is not None:
                    from pykaldi2_tpu.decode.lattice import (best_path,
                                                             lattice_word_fst)

                    if pre is not None:
                        lat, frames = pre[uid]
                    else:
                        lat, frames, _sc = dec.decode_lattice(
                            obs[i, : nf[i]], with_frames=True)
                    wf = None
                    if args.lattice_out or args.nbest or args.oracle \
                            or not args.mbr:
                        wf = lattice_word_fst(lat, loglikes=obs[i, : nf[i]],
                                              frames=frames, acoustic_scale=1.0)
                        if args.lattice_out or args.nbest or args.oracle:
                            word_fsts[uid] = wf
                    if sweep_scales:
                        per_scale = {}
                        for s in sweep_scales:
                            wf_s = lattice_word_fst(
                                lat, loglikes=obs[i, : nf[i]], frames=frames,
                                acoustic_scale=1.0, graph_scale=s)
                            ws, _ = best_path(wf_s)
                            per_scale[s] = [id2w.get(w, f"<{w}>") for w in ws]
                        sweep_hyps[uid] = per_scale
                    if args.mbr:
                        from pykaldi2_tpu.decode.mbr import (
                            lattice_word_fst_timed, mbr_decode)

                        twf, ttimes = lattice_word_fst_timed(
                            lat, loglikes=obs[i, : nf[i]], frames=frames,
                            acoustic_scale=1.0)
                        res = mbr_decode(twf, arc_times=ttimes)
                        mbr_results[uid] = res
                        words = res.words
                    else:
                        words, _ = best_path(wf)
                else:
                    words, _pdfs, _score = dec.decode(obs[i, : nf[i]])
                return uid, [id2w.get(w, f"<{w}>") for w in words]
            except (RuntimeError, ValueError) as e:
                log.warning("decode failed for %s: %s", uid, e)
                return uid, None

        from concurrent.futures import ThreadPoolExecutor

        jobs = [(i, uid, decoders[i % n_threads] if decoders else None)
                for i, uid in enumerate(utt_ids)
                if only is None or uid in only]
        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            # shard jobs so each decoder handle is used by exactly one thread
            def run_shard(t):
                return [_decode_one(j) for j in jobs[t::n_threads]]

            for shard in pool.map(run_shard, range(n_threads)):
                for uid, words in shard:
                    if words is not None:
                        hyps[uid] = words

    def run_batch(item):
        """host_side plus ONE wider-lattice-beam device retry for
        utterances whose pruned lattice kept no complete path. Kaldi's
        extra-cost lattice_beam never prunes the best path; the per-frame
        approximation both decoders use CAN when max_active is narrower
        than the within-lattice-beam token set (the emitted predecessor of
        a token's best in-link drops out, and its remaining in-links fall
        outside the per-dst window — measured on a 490k-state 4-gram HCLG
        at max_active 2048 vs the host's 7000). The retry searches the
        same batch once at min(2*lattice_beam, beam) — one extra compile,
        only utterances that produced NO output are filled in."""
        utt_ids, obs, nf, dev_out = item
        host_side(utt_ids, obs, nf, dev_out)
        if dev_out is None:
            return
        failed = {u for u in utt_ids if u not in hyps}
        lb2 = min(args.lattice_beam * 2.0, args.beam)
        if not failed or lb2 <= args.lattice_beam:
            return
        from pykaldi2_tpu.decode.device_lattice import (
            device_lattice_generate)

        log.warning("%d utterance(s) had no complete lattice path at "
                    "lattice_beam %.1f; retrying on device at %.1f",
                    len(failed), args.lattice_beam, lb2)
        lat2, _s2, drop2, olab2 = device_lattice_generate(
            jnp.asarray(obs), dev_graph, jnp.asarray(np.asarray(nf)),
            max_active=args.max_active, max_arcs=args.max_arcs,
            beam=args.beam, lattice_beam=lb2, return_olabels=True)
        host_side(utt_ids, obs, nf, (lat2, drop2, olab2), only=failed)

    pending = None
    for batch in loader:
        utt_ids = batch.pop("utt_ids")
        nf = batch["num_frames"]
        obs = np.asarray(forward(batch))
        if dump is not None:
            for i, uid in enumerate(utt_ids):
                dump.write(uid, obs[i, : nf[i]])

        if dense_packed is not None:
            from pykaldi2_tpu.decode.on_device import viterbi_decode_words

            words_b, _pdfs, _scores = viterbi_decode_words(
                jnp.asarray(obs), dense_packed, jnp.asarray(np.asarray(nf)))
            for uid, ws in zip(utt_ids, words_b):
                hyps[uid] = [id2w.get(w, f"<{w}>") for w in ws]
            continue

        if dev_graph is not None:
            from pykaldi2_tpu.decode.device_lattice import (
                device_lattice_generate)

            lat_b, _scores_b, dropped, olab = device_lattice_generate(
                jnp.asarray(obs), dev_graph, jnp.asarray(np.asarray(nf)),
                max_active=args.max_active, max_arcs=args.max_arcs,
                beam=args.beam, lattice_beam=args.lattice_beam,
                return_olabels=True)
            if pending is not None:  # chip searches this batch meanwhile
                run_batch(pending)
            pending = (utt_ids, obs, nf, (lat_b, dropped, olab))
        else:
            host_side(utt_ids, obs, nf, None)
    if pending is not None:
        run_batch(pending)
    if dump is not None:
        dump.close()
    if args.ctm_out:
        from pykaldi2_tpu.decode.mbr import write_ctm

        with open(args.ctm_out, "w") as f:
            for uid in sorted(mbr_results):
                write_ctm(f, uid, mbr_results[uid],
                          frame_shift=args.frame_shift, id2w=id2w)
        log.info("wrote CTM for %d utterances to %s",
                 len(mbr_results), args.ctm_out)
    if args.hyp_out:
        with open(args.hyp_out, "w") as f:
            for uid in sorted(hyps):
                f.write(uid + " " + " ".join(hyps[uid]) + "\n")
    if args.lattice_out:
        if args.lattice_out.endswith(".ark"):
            from pykaldi2_tpu.decode.lattice_ark import write_lattice_ark

            write_lattice_ark(args.lattice_out, word_fsts)
        else:
            from pykaldi2_tpu.decode.lattice import write_lattices_text

            write_lattices_text(args.lattice_out, word_fsts)
        log.info("wrote %d word lattices to %s", len(word_fsts), args.lattice_out)
    if args.nbest:
        from pykaldi2_tpu.decode.lattice import nbest as lat_nbest

        nb_f = open(args.nbest_out, "w") if args.nbest_out else sys.stdout
        for uid in sorted(word_fsts):
            for k, (ws, score) in enumerate(lat_nbest(word_fsts[uid], args.nbest)):
                text = " ".join(id2w.get(w, f"<{w}>") for w in ws)
                nb_f.write(f"{uid}-{k + 1} {score:.4f} {text}\n")
        if args.nbest_out:
            nb_f.close()
    if args.ref:
        refs = {}
        with open(args.ref) as f:
            for line in f:
                parts = line.split()
                if parts:
                    refs[parts[0]] = parts[1:]
        result = score_corpus(refs, hyps)
        print(f"%WER {result['wer']:.2f} [ {result['errors']} / {result['ref_len']}, "
              f"{result['ins']} ins, {result['dels']} del, {result['subs']} sub ]")
        if args.oracle:
            from pykaldi2_tpu.decode.lattice import oracle_errors

            w2id = {w: i for i, w in id2w.items()}
            o_err, o_len = 0, 0
            for uid, wf in word_fsts.items():
                if uid not in refs:
                    continue
                rids = [w2id.get(w, -1) for w in refs[uid]]
                o_err += oracle_errors(wf, rids)
                o_len += len(rids)
            if o_len:
                print(f"%Oracle WER {100.0 * o_err / o_len:.2f} "
                      f"[ {o_err} / {o_len} ]")
        if sweep_scales:
            # Kaldi scoring-script lmwt sweep: WER per LM scale, best last
            best = None
            for s in sweep_scales:
                hs = {u: per[s] for u, per in sweep_hyps.items()}
                r = score_corpus(refs, hs)
                print(f"lm_scale {s:g}: %WER {r['wer']:.2f} "
                      f"[ {r['errors']} / {r['ref_len']} ]")
                if best is None or r["wer"] < best[1]:
                    best = (s, r["wer"])
            print(f"best lm_scale {best[0]:g}: %WER {best[1]:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
