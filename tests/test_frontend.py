"""Front-end parity tests vs the independent scalar golden (tests/kaldi_ref.py).

BASELINE.json config #2: "Fused front end: fbank/MFCC + CMVN ... feature
parity vs Kaldi". Dither is off (deterministic), per SURVEY.md §8 hard part 3.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.config import FbankOpts, FrameOpts, MelOpts, MfccOpts
from pykaldi2_tpu.frontend import (
    add_deltas,
    apply_cmvn,
    acc_cmvn_stats,
    compute_fbank,
    compute_mfcc,
    splice_frames,
    utterance_cmvn,
)
from pykaldi2_tpu.frontend.cmvn import cmvn_mean_std

from kaldi_ref import ref_deltas, ref_fbank, ref_mfcc, ref_splice


def _wave(n=16000 * 2 + 137, seed=0, scale=8192.0):
    rng = np.random.RandomState(seed)
    # int16-ish amplitudes, like real PCM
    return (rng.randn(n) * scale).astype(np.float32)


@pytest.mark.parametrize("use_matmul_dft", [True, False])
def test_fbank_matches_golden(use_matmul_dft):
    wave = _wave()
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=80))
    got = np.asarray(compute_fbank(jnp.asarray(wave), opts, use_matmul_dft=use_matmul_dft))
    want = ref_fbank(wave.astype(np.float64), num_bins=80)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fbank_energy_and_linear():
    wave = _wave(seed=1)
    opts = FbankOpts(
        frame_opts=FrameOpts(dither=0.0),
        mel_opts=MelOpts(num_bins=40),
        use_energy=True,
        use_log_fbank=False,
    )
    got = np.asarray(compute_fbank(jnp.asarray(wave), opts))
    want = ref_fbank(wave.astype(np.float64), num_bins=40, use_energy=True, use_log_fbank=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4)


def test_fbank_no_snip_edges():
    wave = _wave(seed=2, n=16000)
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0, snip_edges=False), mel_opts=MelOpts(num_bins=30))
    got = np.asarray(compute_fbank(jnp.asarray(wave), opts))
    want = ref_fbank(wave.astype(np.float64), num_bins=30, snip_edges=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fbank_batched_matches_single():
    waves = np.stack([_wave(seed=s, n=8000) for s in range(3)])
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0))
    batched = np.asarray(compute_fbank(jnp.asarray(waves), opts))
    for i in range(3):
        single = np.asarray(compute_fbank(jnp.asarray(waves[i]), opts))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6)


def test_fbank_hamming_window():
    wave = _wave(seed=3, n=12000)
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0, window_type="hamming"), mel_opts=MelOpts(num_bins=23))
    got = np.asarray(compute_fbank(jnp.asarray(wave), opts))
    want = ref_fbank(wave.astype(np.float64), num_bins=23, window_type="hamming")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mfcc_matches_golden():
    wave = _wave(seed=4)
    opts = MfccOpts(frame_opts=FrameOpts(dither=0.0))
    got = np.asarray(compute_mfcc(jnp.asarray(wave), opts))
    want = ref_mfcc(wave.astype(np.float64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_deltas_match_golden():
    rng = np.random.RandomState(5)
    feats = rng.randn(50, 13).astype(np.float32)
    got = np.asarray(add_deltas(jnp.asarray(feats), order=2, window=2))
    want = ref_deltas(feats.astype(np.float64), order=2, window=2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_splice_matches_golden():
    rng = np.random.RandomState(6)
    feats = rng.randn(20, 8).astype(np.float32)
    got = np.asarray(splice_frames(jnp.asarray(feats), 3, 2))
    want = ref_splice(feats.astype(np.float64), 3, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_global_cmvn_roundtrip():
    rng = np.random.RandomState(7)
    f1, f2 = rng.randn(100, 40) * 3 + 5, rng.randn(60, 40) * 3 + 5
    stats = acc_cmvn_stats(f1)
    stats = acc_cmvn_stats(f2, stats)
    mean, scale = cmvn_mean_std(stats, norm_vars=True)
    allf = np.concatenate([f1, f2])
    np.testing.assert_allclose(mean, allf.mean(0), rtol=1e-5)
    out = np.asarray(apply_cmvn(jnp.asarray(allf, dtype=jnp.float32), mean, scale))
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-3)


def test_utterance_cmvn_masked():
    rng = np.random.RandomState(8)
    feats = rng.randn(30, 10).astype(np.float32)
    padded = np.concatenate([feats, np.full((10, 10), 1e3, np.float32)])
    mask = np.concatenate([np.ones(30), np.zeros(10)]).astype(np.float32)
    out = np.asarray(utterance_cmvn(jnp.asarray(padded), norm_vars=True, mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out[:30].mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out[:30].std(0), 1.0, atol=1e-2)


def test_fbank_jit_and_grad():
    """The front end must be jittable and differentiable (for future e2e use)."""
    wave = jnp.asarray(_wave(n=4000, seed=9))
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=40))
    f = jax.jit(lambda w: compute_fbank(w, opts))
    out = f(wave)
    assert out.dtype == jnp.float32
    g = jax.grad(lambda w: jnp.sum(compute_fbank(w, opts)))(wave)
    assert np.isfinite(np.asarray(g)).all()


def test_vtln_warp_shifts_mel_banks():
    from pykaldi2_tpu.frontend.mel import mel_banks
    fo = FrameOpts()
    mo = MelOpts(num_bins=30)
    plain = mel_banks(mo, fo, warp=1.0)
    warped = mel_banks(mo, fo, warp=1.1)
    assert plain.shape == warped.shape
    assert not np.allclose(plain, warped)
    # warp > 1 compresses the spectrum: each bank's center of mass moves down
    freqs = np.arange(plain.shape[1])
    com_p = (plain * freqs).sum(1) / np.maximum(plain.sum(1), 1e-9)
    com_w = (warped * freqs).sum(1) / np.maximum(warped.sum(1), 1e-9)
    mid = slice(5, 25)
    assert (com_w[mid] < com_p[mid] + 1e-6).all()


def test_sliding_cmvn_wide_window_equals_utterance():
    from pykaldi2_tpu.frontend import apply_cmvn_sliding
    rng = np.random.RandomState(12)
    feats = rng.randn(50, 8).astype(np.float32) * 3 + 2
    slid = np.asarray(apply_cmvn_sliding(jnp.asarray(feats), window=1000, norm_vars=False))
    want = feats - feats.mean(0)
    np.testing.assert_allclose(slid, want, atol=1e-4)


def test_sliding_cmvn_local_window():
    from pykaldi2_tpu.frontend import apply_cmvn_sliding
    rng = np.random.RandomState(13)
    # mean shifts halfway through; a local window should track it
    a = rng.randn(60, 4).astype(np.float32)
    a[30:] += 10.0
    out = np.asarray(apply_cmvn_sliding(jnp.asarray(a), window=20))
    assert abs(out[10].mean()) < 2.0 and abs(out[50].mean()) < 2.0
