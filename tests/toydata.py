"""Synthetic toy corpus builder for tests and smoke training runs.

Generates wav files whose spectral content is correlated with the frame
labels (each 'phone' is a band-limited noise burst), so a tiny model can
actually learn — loss decrease is then a meaningful end-to-end signal.
"""

from __future__ import annotations

import os

import numpy as np

from pykaldi2_tpu.config import FrameOpts
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.data.wav import write_wav
from pykaldi2_tpu.frontend.window import num_frames


def make_word_corpus(
    root: str,
    tm,
    lexicon: dict,
    sents: list,
    *,
    samp_freq: int = 16000,
    seed: int = 0,
    frames_per_state=(3, 7),
    prefix: str = "utt",
    tone_seed: int = 1234,
):
    """Word-structured synthetic corpus: sentences → phone sequences →
    3-state HMM frame labels (pdf ids from ``tm.pdf_map``) + waveforms whose
    spectra are keyed by (phone, hmm-state) — each state is a two-tone
    band-limited burst, so a context model can learn the full state
    inventory and a decode run measures real WER (VERDICT r3 item 5's
    mid-scale recipe stand-in).

    Writes ``wav/``, ``wav.scp``, ``ali.ark`` (pdf ids), ``text`` (word
    transcripts). Returns a paths dict.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    fo = FrameOpts(samp_freq=float(samp_freq), dither=0.0)
    shift, win = fo.window_shift, fo.window_size
    phones = sorted(tm.topo.phones)
    n_states = {p: len(tm.topo.states_for(p)) for p in phones}
    # (phone, state) → two characteristic tone frequencies, well separated.
    # The tone table uses its OWN fixed seed: train and test corpora built
    # with different `seed`s must still share acoustics, or a model trained
    # on one cannot decode the other (measured: 164% WER at 99% CE acc).
    tone = {}
    freqs = np.linspace(220.0, min(3900.0, samp_freq / 2 - 200.0),
                        sum(n_states.values()) + 1)
    np.random.RandomState(tone_seed).shuffle(freqs)
    i = 0
    for p in phones:
        for j in range(n_states[p]):
            tone[(p, j)] = (freqs[i], freqs[(i * 7 + 3) % len(freqs)])
            i += 1
    scp_lines, alis, texts = [], [], []
    for u, sent in enumerate(sents):
        utt = f"{prefix}{u:05d}"
        segs = []                                    # (pdf, phone, state, nf)
        for wd in sent:
            for p in lexicon[wd][0]:
                for j in range(n_states[p]):
                    segs.append((tm.pdf_map[(p, j)], p, j,
                                 int(rng.randint(*frames_per_state))))
        nf = sum(s[3] for s in segs)
        n = (nf - 1) * shift + win
        labels = np.zeros(nf, np.int32)
        wave = rng.randn(n).astype(np.float32) * 200.0      # noise floor
        t0 = 0
        tt_full = np.arange(n) / samp_freq
        for pdf, p, j, dur in segs:
            labels[t0:t0 + dur] = pdf
            s0 = t0 * shift
            s1 = min((t0 + dur - 1) * shift + win, n)
            tt = tt_full[s0:s1]
            f1, f2 = tone[(p, j)]
            sig = (np.sin(2 * np.pi * f1 * tt + rng.uniform(0, 6.28))
                   + 0.6 * np.sin(2 * np.pi * f2 * tt + rng.uniform(0, 6.28)))
            wave[s0:s1] += (sig * 5000.0).astype(np.float32)
            t0 += dur
        path = os.path.join(root, "wav", utt + ".wav")
        write_wav(path, wave, samp_freq)
        scp_lines.append(f"{utt} {path}\n")
        alis.append((utt, labels))
        texts.append(f"{utt} {' '.join(sent)}\n")
    with open(os.path.join(root, "wav.scp"), "w") as f:
        f.writelines(scp_lines)
    with open(os.path.join(root, "text"), "w") as f:
        f.writelines(texts)
    ali_path = os.path.join(root, "ali.ark")
    with kaldi_io.ArkWriter(ali_path, kind="ivec") as w:
        for utt, lab in alis:
            w.write(utt, lab)
    return {"wav_scp": os.path.join(root, "wav.scp"), "ali": ali_path,
            "text": os.path.join(root, "text"), "num_pdfs": tm.num_pdfs}


def make_toy_corpus(
    root: str,
    num_utts: int = 8,
    num_pdfs: int = 6,
    min_sec: float = 0.5,
    max_sec: float = 2.0,
    samp_freq: int = 16000,
    seed: int = 0,
    text_ali: bool = False,
):
    """Create wav/, wav.scp, ali.ark (+ returns paths dict)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    fo = FrameOpts(samp_freq=float(samp_freq), dither=0.0)
    scp_path = os.path.join(root, "wav.scp")
    ali_path = os.path.join(root, "ali.ark")
    centers = np.linspace(300, 3500, num_pdfs)
    scp_lines = []
    alis = []
    for i in range(num_utts):
        utt = f"utt{i:03d}"
        n = int(samp_freq * rng.uniform(min_sec, max_sec))
        nf = num_frames(n, fo)
        # segment into 'phones' of 10-40 frames
        labels = np.zeros(nf, np.int32)
        wave = np.zeros(n, np.float32)
        t0 = 0
        while t0 < nf:
            seg = int(rng.randint(10, 40))
            pdf = int(rng.randint(num_pdfs))
            t1 = min(t0 + seg, nf)
            labels[t0:t1] = pdf
            s0, s1 = t0 * fo.window_shift, min(t1 * fo.window_shift + fo.window_size, n)
            seg_n = s1 - s0
            tt = np.arange(seg_n) / samp_freq
            tone = np.sin(2 * np.pi * centers[pdf] * tt + rng.uniform(0, 6.28))
            wave[s0:s1] += (tone * 6000 + rng.randn(seg_n) * 300).astype(np.float32)
            t0 = t1
        path = os.path.join(root, "wav", utt + ".wav")
        write_wav(path, wave, samp_freq)
        scp_lines.append(f"{utt} {path}\n")
        alis.append((utt, labels))
    with open(scp_path, "w") as f:
        f.writelines(scp_lines)
    if text_ali:
        kaldi_io.write_text_ark(ali_path, alis)
    else:
        with kaldi_io.ArkWriter(ali_path, kind="ivec") as w:
            for utt, lab in alis:
                w.write(utt, lab)
    return {"wav_scp": scp_path, "ali": ali_path, "num_pdfs": num_pdfs}
