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
