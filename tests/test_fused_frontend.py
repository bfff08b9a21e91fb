"""Pallas fused fbank kernel vs the reference JAX front end (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.config import FbankOpts, FrameOpts, MelOpts
from pykaldi2_tpu.frontend import compute_fbank
from pykaldi2_tpu.frontend.fused import fused_fbank


def test_fused_fbank_matches_reference():
    rng = np.random.RandomState(0)
    wave = (rng.randn(3, 8000) * 4000).astype(np.float32)
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=40))
    ref = np.asarray(compute_fbank(jnp.asarray(wave), opts))
    got = np.asarray(fused_fbank(jnp.asarray(wave), opts, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_fbank_80_bins_hamming():
    rng = np.random.RandomState(1)
    wave = (rng.randn(2, 4480) * 2000).astype(np.float32)
    opts = FbankOpts(frame_opts=FrameOpts(dither=0.0, window_type="hamming"),
                     mel_opts=MelOpts(num_bins=80))
    ref = np.asarray(compute_fbank(jnp.asarray(wave), opts))
    got = np.asarray(fused_fbank(jnp.asarray(wave), opts, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_fbank_rejects_dither():
    opts = FbankOpts(frame_opts=FrameOpts(dither=1.0))
    with pytest.raises(ValueError, match="dither"):
        fused_fbank(jnp.zeros((1, 4000)), opts, interpret=True)


def test_fused_mfcc_matches_reference():
    from pykaldi2_tpu.config import MfccOpts
    from pykaldi2_tpu.frontend import compute_mfcc
    from pykaldi2_tpu.frontend.fused import fused_mfcc

    rng = np.random.RandomState(2)
    wave = (rng.randn(2, 6400) * 4000).astype(np.float32)
    opts = MfccOpts(frame_opts=FrameOpts(dither=0.0))
    ref = np.asarray(compute_mfcc(jnp.asarray(wave), opts))
    got = np.asarray(fused_mfcc(jnp.asarray(wave), opts, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_fused_mfcc_no_energy():
    from pykaldi2_tpu.config import MfccOpts
    from pykaldi2_tpu.frontend import compute_mfcc
    from pykaldi2_tpu.frontend.fused import fused_mfcc

    rng = np.random.RandomState(3)
    wave = (rng.randn(1, 4800) * 2000).astype(np.float32)
    opts = MfccOpts(frame_opts=FrameOpts(dither=0.0), use_energy=False, cepstral_lifter=0.0)
    ref = np.asarray(compute_mfcc(jnp.asarray(wave), opts))
    got = np.asarray(fused_mfcc(jnp.asarray(wave), opts, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)
