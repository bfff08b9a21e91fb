"""Pallas fused fbank kernel: window→DFT→mel→log in one VMEM pass.

BASELINE.json north star: "the Kaldi-derived front end ... become fused
Pallas kernels producing HBM-resident batches". Framing stays an XLA gather
(Mosaic cannot issue lane-unaligned dynamic VMEM loads for a 160-sample
hop); each grid step then takes one utterance's padded frame block through
DC-offset removal, pre-emphasis, and windowing on the VPU and the
GEMM-native real DFT + mel GEMMs on the MXU (fp32) without touching HBM in
between — only log-mel features return.

Matches frontend/fbank.compute_fbank semantics with dither off (the batch
path applies dither beforehand if needed); parity tested in
tests/test_fused_frontend.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pykaldi2_tpu.ops.lstm_pallas import _sds

from pykaldi2_tpu.config import FbankOpts
from pykaldi2_tpu.frontend import window as W
from pykaldi2_tpu.frontend.fbank import _dft_matrices
from pykaldi2_tpu.frontend.mel import mel_banks


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(frames_ref, cosm_ref, sinm_ref, melw_ref, win_ref, out_ref,
            *, win_size, remove_dc, preemph, log_floor):
    # frames_ref: [R, n_fft] raw frame rows (any utterance), zero beyond
    # win_size. Window/DC/pre-emphasis run on the VPU; zeroed tail columns
    # stay zero because the window vector is zero-padded to n_fft too.
    hi = jax.lax.Precision.HIGHEST  # fp32-exact MXU passes (front-end contract)
    x = frames_ref[:, :]
    if remove_dc:
        # mean over the real window only (tail columns are zeros)
        mean = jnp.sum(x, axis=1, keepdims=True) * (1.0 / win_size)
        mask = win_ref[1, :]  # 1.0 on the first win_size columns
        x = x - mean * mask
    if preemph != 0.0:
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        # pre-emphasis applies inside the window only; col win_size.. stays 0
        x = x - preemph * prev * win_ref[1, :]
    x = x * win_ref[0, :]
    # power spectrum via GEMM-native real DFT (MXU, fp32)
    re = jnp.dot(x, cosm_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(x, sinm_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    spec = re * re + im * im
    mel = jnp.dot(spec, melw_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    out_ref[:, :] = jnp.log(jnp.maximum(mel, log_floor))


@functools.lru_cache(maxsize=8)
def _constants(opts_key):
    opts, = opts_key
    fo = opts.frame_opts
    n_fft = fo.padded_window_size
    cos_m, sin_m = _dft_matrices(n_fft)          # [n_fft, n_fft//2]
    mel = mel_banks(opts.mel_opts, fo).T          # [n_fft//2, num_bins]
    win = W.feature_window(fo)
    nb_pad = _round_up(mel.shape[1], 128)
    mel_p = np.zeros((mel.shape[0], nb_pad), np.float32)
    mel_p[:, : mel.shape[1]] = mel
    win_p = np.zeros((2, n_fft), np.float32)
    win_p[0, : win.shape[0]] = win
    win_p[1, : win.shape[0]] = 1.0  # validity mask of the analysis window
    return cos_m, sin_m, mel_p, win_p


def fused_fbank(wave: jax.Array, opts: FbankOpts, interpret: bool = False) -> jax.Array:
    """[B, S] fp32 waveform → [B, T, num_bins] log-mel (dither must be 0)."""
    if opts.frame_opts.dither != 0.0:
        raise ValueError("fused kernel expects dither pre-applied (or 0)")
    if opts.use_energy or not opts.use_log_fbank or not opts.use_power:
        raise ValueError("fused kernel covers the standard log-power fbank path")
    fo = opts.frame_opts
    b, s = wave.shape
    t_frames = W.num_frames(s, fo)
    n_fft = fo.padded_window_size
    nb = opts.mel_opts.num_bins
    cos_m, sin_m, mel_p, win_p = _constants((_HashableOpts(opts),))
    # framing is an XLA gather (Mosaic cannot do lane-unaligned dynamic VMEM
    # slices for a 160-sample hop); everything after framing fuses in-kernel.
    # All frames of the batch flatten into one row matrix so each grid step
    # feeds the MXU a full [R, n_fft] block regardless of utterance length.
    frames = W.extract_frames(wave, fo)                       # [B, T, win]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - fo.window_size)))
    n_rows = b * t_frames
    R = 256
    n_pad = _round_up(max(n_rows, R), R)
    flat = jnp.pad(frames.reshape(n_rows, n_fft), ((0, n_pad - n_rows), (0, 0)))

    kernel = functools.partial(
        _kernel, win_size=fo.window_size, remove_dc=fo.remove_dc_offset,
        preemph=fo.preemph_coeff, log_floor=W.FLT_EPSILON)
    nb_pad = mel_p.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // R,),
        in_specs=[
            pl.BlockSpec((R, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft // 2, nb_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, nb_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=_sds((n_pad, nb_pad), jnp.float32, flat),
        interpret=interpret,
    )(flat, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(mel_p),
      jnp.asarray(win_p))
    return out[:n_rows, :nb].reshape(b, t_frames, nb)


def _mfcc_kernel(frames_ref, cosm_ref, sinm_ref, melw_ref, win_ref, dct_ref,
                 out_ref, *, win_size, remove_dc, preemph, log_floor,
                 use_energy, energy_floor):
    """MFCC variant: …→log-mel→DCT→lifter (lifter is folded into dct_ref);
    col 0 holds raw log-energy when use_energy."""
    hi = jax.lax.Precision.HIGHEST
    x = frames_ref[:, :]
    if remove_dc:
        mean = jnp.sum(x, axis=1, keepdims=True) * (1.0 / win_size)
        x = x - mean * win_ref[1, :]
    if use_energy:  # raw energy: after DC removal, before pre-emphasis
        log_e = jnp.log(jnp.maximum(jnp.sum(x * x, axis=1), log_floor))
        if energy_floor > 0.0:
            log_e = jnp.maximum(log_e, float(np.log(energy_floor)))
    if preemph != 0.0:
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        x = x - preemph * prev * win_ref[1, :]
    x = x * win_ref[0, :]
    re = jnp.dot(x, cosm_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(x, sinm_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    spec = re * re + im * im
    mel = jnp.dot(spec, melw_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    logmel = jnp.log(jnp.maximum(mel, log_floor))
    ceps = jnp.dot(logmel, dct_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    if use_energy:
        ceps = jnp.concatenate([log_e[:, None], ceps[:, 1:]], axis=1)
    out_ref[:, :] = ceps


def fused_mfcc(wave: jax.Array, opts, interpret: bool = False) -> jax.Array:
    """[B, S] waveform → [B, T, num_ceps] MFCC (dither must be 0).

    Same fusion strategy as fused_fbank; the lifter coefficients are folded
    into the (zero-row-padded) DCT matrix so liftering is free.
    """
    from pykaldi2_tpu.config import MfccOpts
    from pykaldi2_tpu.frontend.mfcc import dct_matrix, lifter_coeffs

    assert isinstance(opts, MfccOpts)
    fo = opts.frame_opts
    if fo.dither != 0.0:
        raise ValueError("fused kernel expects dither pre-applied (or 0)")
    b, s = wave.shape
    t_frames = W.num_frames(s, fo)
    n_fft = fo.padded_window_size
    nb = opts.mel_opts.num_bins

    fb_like = FbankOpts(frame_opts=fo, mel_opts=opts.mel_opts)
    cos_m, sin_m, mel_p, win_p = _constants((_HashableOpts(fb_like),))
    nb_pad = mel_p.shape[1]
    dct = dct_matrix(opts.num_ceps, nb)                    # [ceps, nb]
    if opts.cepstral_lifter != 0.0:
        dct = dct * lifter_coeffs(opts.num_ceps, opts.cepstral_lifter)[:, None]
    ceps_pad = _round_up(opts.num_ceps, 128)
    dct_p = np.zeros((nb_pad, ceps_pad), np.float32)
    dct_p[:nb, : opts.num_ceps] = dct.T                    # zero rows kill padding cols

    frames = W.extract_frames(wave, fo)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - fo.window_size)))
    n_rows = b * t_frames
    R = 256
    n_pad = _round_up(max(n_rows, R), R)
    flat = jnp.pad(frames.reshape(n_rows, n_fft), ((0, n_pad - n_rows), (0, 0)))

    kernel = functools.partial(
        _mfcc_kernel, win_size=fo.window_size, remove_dc=fo.remove_dc_offset,
        preemph=fo.preemph_coeff, log_floor=W.FLT_EPSILON,
        use_energy=opts.use_energy, energy_floor=opts.energy_floor)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // R,),
        in_specs=[
            pl.BlockSpec((R, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft // 2, nb_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, ceps_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, ceps_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=_sds((n_pad, ceps_pad), jnp.float32, flat),
        interpret=interpret,
    )(flat, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(mel_p),
      jnp.asarray(win_p), jnp.asarray(dct_p))
    return out[:n_rows, : opts.num_ceps].reshape(b, t_frames, opts.num_ceps)


class _HashableOpts:
    """Hash FbankOpts by its relevant field values for the constants cache."""

    def __init__(self, opts: FbankOpts):
        self.opts = opts
        fo, mo = opts.frame_opts, opts.mel_opts
        self._key = (fo.samp_freq, fo.frame_shift_ms, fo.frame_length_ms,
                     fo.preemph_coeff, fo.remove_dc_offset, fo.window_type,
                     fo.round_to_power_of_two, fo.blackman_coeff,
                     mo.num_bins, mo.low_freq, mo.high_freq,
                     mo.vtln_warp, mo.vtln_low, mo.vtln_high)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableOpts) and self._key == other._key

    @property
    def frame_opts(self):
        return self.opts.frame_opts

    @property
    def mel_opts(self):
        return self.opts.mel_opts
