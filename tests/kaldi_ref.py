"""Independent golden reference for the Kaldi-semantics front end.

This is a deliberately naive per-frame, scalar-loop numpy implementation
mirroring the algorithm of kaldi/src/feat/{feature-window,feature-fbank,
feature-mfcc,mel-computations}.cc, written separately from the vectorized JAX
implementation so the two cross-check each other (SURVEY.md §5 golden-vector
strategy). Double precision internally.
"""

from __future__ import annotations

import numpy as np

FLT_EPS = float(np.finfo(np.float32).eps)


def ref_window_fn(window_type: str, n: int, blackman_coeff: float = 0.42) -> np.ndarray:
    a = 2.0 * np.pi / (n - 1)
    w = np.zeros(n)
    for i in range(n):
        if window_type == "hanning":
            w[i] = 0.5 - 0.5 * np.cos(a * i)
        elif window_type == "sine":
            w[i] = np.sin(0.5 * a * i)
        elif window_type == "hamming":
            w[i] = 0.54 - 0.46 * np.cos(a * i)
        elif window_type == "povey":
            w[i] = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
        elif window_type == "rectangular":
            w[i] = 1.0
        elif window_type == "blackman":
            w[i] = blackman_coeff - 0.5 * np.cos(a * i) + (0.5 - blackman_coeff) * np.cos(2 * a * i)
        else:
            raise ValueError(window_type)
    return w


def ref_mel_banks(num_bins, num_fft_bins, samp_freq, padded_window, low_freq, high_freq):
    nyquist = samp_freq / 2.0
    if high_freq <= 0:
        high_freq = nyquist + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    fft_bin_width = samp_freq / padded_window
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    delta = (mel_high - mel_low) / (num_bins + 1)
    banks = np.zeros((num_bins, num_fft_bins))
    for b in range(num_bins):
        left, center, right = mel_low + b * delta, mel_low + (b + 1) * delta, mel_low + (b + 2) * delta
        for j in range(num_fft_bins):
            m = mel(fft_bin_width * j)
            if left < m < right:
                banks[b, j] = (m - left) / (center - left) if m <= center else (right - m) / (right - center)
    return banks


def _process_frame(frame, preemph, remove_dc, window_fn, want_energy):
    frame = frame.astype(np.float64).copy()
    n = frame.size
    if remove_dc:
        frame -= frame.mean()
    log_energy = None
    if want_energy:
        log_energy = np.log(max(np.dot(frame, frame), FLT_EPS))
    if preemph != 0.0:
        for i in range(n - 1, 0, -1):
            frame[i] -= preemph * frame[i - 1]
        frame[0] -= preemph * frame[0]
    frame *= window_fn
    return frame, log_energy


def ref_fbank(
    wave,
    samp_freq=16000.0,
    frame_length_ms=25.0,
    frame_shift_ms=10.0,
    num_bins=80,
    low_freq=20.0,
    high_freq=0.0,
    preemph=0.97,
    remove_dc=True,
    window_type="povey",
    use_energy=False,
    raw_energy=True,
    use_log_fbank=True,
    use_power=True,
    snip_edges=True,
):
    window = int(samp_freq * 0.001 * frame_length_ms)
    shift = int(samp_freq * 0.001 * frame_shift_ms)
    padded = 1
    while padded < window:
        padded *= 2
    n = wave.size
    if snip_edges:
        nf = 0 if n < window else 1 + (n - window) // shift
        starts = [t * shift for t in range(nf)]
        frames = [wave[s : s + window] for s in starts]
    else:
        nf = (n + shift // 2) // shift
        frames = []
        for t in range(nf):
            start = t * shift + shift // 2 - window // 2
            idx = np.arange(start, start + window)
            idx = np.where(idx < 0, -idx - 1, idx)
            idx = np.where(idx >= n, 2 * n - idx - 1, idx)
            frames.append(wave[idx])
    wfn = ref_window_fn(window_type, window)
    banks = ref_mel_banks(num_bins, padded // 2, samp_freq, padded, low_freq, high_freq)
    feats = np.zeros((nf, num_bins + (1 if use_energy else 0)))
    for t in range(nf):
        proc, log_e = _process_frame(frames[t], preemph, remove_dc, wfn, use_energy and raw_energy)
        if use_energy and not raw_energy:
            log_e = np.log(max(np.dot(proc, proc), FLT_EPS))
        buf = np.zeros(padded)
        buf[:window] = proc
        spec = np.abs(np.fft.rfft(buf)[: padded // 2]) ** 2
        if not use_power:
            spec = np.sqrt(spec)
        mel_e = banks @ spec
        col0 = 0
        if use_energy:
            feats[t, 0] = log_e
            col0 = 1
        feats[t, col0:] = np.log(np.maximum(mel_e, FLT_EPS)) if use_log_fbank else mel_e
    return feats


def ref_mfcc(
    wave,
    samp_freq=16000.0,
    num_bins=23,
    num_ceps=13,
    cepstral_lifter=22.0,
    use_energy=True,
    **kw,
):
    logmel = ref_fbank(
        wave, samp_freq=samp_freq, num_bins=num_bins, use_energy=use_energy,
        use_log_fbank=True, use_power=True, **kw,
    )
    if use_energy:
        energy, logmel = logmel[:, 0], logmel[:, 1:]
    dct = np.zeros((num_ceps, num_bins))
    dct[0, :] = np.sqrt(1.0 / num_bins)
    for k in range(1, num_ceps):
        for j in range(num_bins):
            dct[k, j] = np.sqrt(2.0 / num_bins) * np.cos(np.pi / num_bins * (j + 0.5) * k)
    ceps = logmel @ dct.T
    if cepstral_lifter != 0.0:
        lift = 1.0 + 0.5 * cepstral_lifter * np.sin(np.pi * np.arange(num_ceps) / cepstral_lifter)
        ceps *= lift
    if use_energy:
        ceps[:, 0] = energy
    return ceps


def ref_deltas(feats, order=2, window=2):
    """Kaldi DeltaFeatures with clamped edges, scalar loops."""
    scales = [np.array([1.0])]
    for _ in range(order):
        prev, w = scales[-1], window
        norm = sum(i * i for i in range(-w, w + 1))
        cur = np.zeros(prev.size + 2 * w)
        for off in range(-w, w + 1):
            cur[off + w : off + w + prev.size] += (off / norm) * prev
        scales.append(cur)
    t_len, d = feats.shape
    out = np.zeros((t_len, d * (order + 1)))
    for t in range(t_len):
        for o, s in enumerate(scales):
            half = s.size // 2
            acc = np.zeros(d)
            for j, c in enumerate(s):
                tt = min(max(t + j - half, 0), t_len - 1)
                acc += c * feats[tt]
            out[t, o * d : (o + 1) * d] = acc
    return out


def ref_splice(feats, left, right):
    t_len, d = feats.shape
    out = np.zeros((t_len, d * (left + 1 + right)))
    for t in range(t_len):
        for k, off in enumerate(range(-left, right + 1)):
            tt = min(max(t + off, 0), t_len - 1)
            out[t, k * d : (k + 1) * d] = feats[tt]
    return out
