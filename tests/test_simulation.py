"""Simulation tests: RIR physics, SNR mixing, resampling, device/host parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pykaldi2_tpu.config import (NoiseConfig, PerturbConfig, ReverbConfig,
                                 SimulationConfig)
from pykaldi2_tpu.simulation import (Simulator, batch_fft_convolve,
                                     batch_mix_noise_at_snr, image_source_rir,
                                     sample_room_rir, simulate_batch)
from pykaldi2_tpu.simulation.resample import resample, speed_perturb_labels
from pykaldi2_tpu.simulation.simulator import fft_convolve, mix_at_snr


def test_rir_physics():
    room = [5.0, 4.0, 3.0]
    src = [1.0, 2.0, 1.5]
    mic = np.array([[3.0, 2.0, 1.5]])
    rir = image_source_rir(room, src, mic, t60=0.3, samp_freq=16000.0)
    assert rir.shape[0] == 1 and rir.shape[1] > 1000
    # direct path: distance 2m → delay 2/343*16000 ≈ 93.3 samples; the first
    # arrival must be there with amplitude ~ 1/(4π·2) (split over 2 bins by
    # the fractional-delay interpolation)
    first = int(np.flatnonzero(np.abs(rir[0]) > 1e-6)[0])
    assert first == 93, first
    np.testing.assert_allclose(rir[0, 93] + rir[0, 94], 1.0 / (4 * np.pi * 2.0), rtol=1e-3)
    # energy decays: late half has less energy than early half
    half = rir.shape[1] // 2
    assert np.sum(rir[0, :half] ** 2) > np.sum(rir[0, half:] ** 2)


def test_sample_room_rir_multichannel():
    rng = np.random.RandomState(0)
    rirs = sample_room_rir(rng, num_mics=3)
    assert rirs.shape[0] == 3
    assert np.isfinite(rirs).all()
    # channels differ but are correlated in timing
    assert not np.allclose(rirs[0], rirs[1])


def test_fft_convolve_matches_direct():
    rng = np.random.RandomState(1)
    wave = rng.randn(500).astype(np.float32)
    rir = rng.randn(64).astype(np.float32) * np.exp(-np.arange(64) / 10)
    got = fft_convolve(wave, rir)
    want = np.convolve(wave, rir)[:500]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mix_at_snr_achieves_target():
    rng = np.random.RandomState(2)
    speech = (rng.randn(8000) * 1000).astype(np.float32)
    noise = rng.randn(8000).astype(np.float32)
    mixed = mix_at_snr(speech, noise, snr_db=10.0)
    added = mixed - speech
    snr = 10 * np.log10(np.mean(speech**2) / np.mean(added**2))
    np.testing.assert_allclose(snr, 10.0, atol=0.1)


def test_resample_length_and_tone():
    sr = 16000
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    fast = resample(wave, 1.1)
    slow = resample(wave, 0.9)
    assert abs(fast.shape[0] - sr / 1.1) <= 1
    assert abs(slow.shape[0] - sr / 0.9) <= 1
    # 440 Hz resampled at speed 1.1 → 484 Hz content; check via FFT peak
    spec = np.abs(np.fft.rfft(fast * np.hanning(len(fast))))
    peak_hz = np.argmax(spec) * sr / len(fast)
    np.testing.assert_allclose(peak_hz, 484, atol=6)
    labs = speed_perturb_labels(np.arange(100), 1.1, 90)
    assert labs[0] == 0 and labs[-1] == 97


def test_simulator_pipeline_runs():
    cfg = SimulationConfig(
        enabled=True,
        reverb=ReverbConfig(use_reverb=True, prob=1.0, rt60_range=(0.1, 0.3)),
        noise=NoiseConfig(use_noise=True, prob=1.0, snr_range=(5.0, 15.0)),
        perturb=PerturbConfig(use_gain=True, gain_range=(-5.0, 5.0),
                              use_speed=True, speed_choices=(0.9, 1.1)),
    )
    sim = Simulator(cfg)
    rng = np.random.RandomState(3)
    wave = (rng.randn(16000) * 2000).astype(np.float32)
    labels = rng.randint(0, 5, 98).astype(np.int32)
    out, labs = sim.simulate_with_labels(wave, labels, rng)
    assert np.isfinite(out).all()
    assert labs is not None and len(labs) > 0
    # speed change altered duration
    assert out.shape[0] != wave.shape[0]


def test_device_batch_matches_host():
    rng = np.random.RandomState(4)
    waves = (rng.randn(2, 1000) * 500).astype(np.float32)
    rirs = (rng.randn(2, 32) * np.exp(-np.arange(32) / 8)).astype(np.float32)
    got = np.asarray(batch_fft_convolve(jnp.asarray(waves), jnp.asarray(rirs)))
    for i in range(2):
        want = np.convolve(waves[i], rirs[i])[:1000]
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=2e-2)
    # SNR mixing parity
    noises = rng.randn(2, 1000).astype(np.float32)
    mixed = np.asarray(batch_mix_noise_at_snr(
        jnp.asarray(waves), jnp.asarray(noises), jnp.asarray([10.0, 0.0])))
    for i, snr_t in enumerate([10.0, 0.0]):
        added = mixed[i] - waves[i]
        snr = 10 * np.log10(np.mean(waves[i] ** 2) / np.mean(added**2))
        np.testing.assert_allclose(snr, snr_t, atol=0.2)


def test_simulate_batch_jit():
    rng = np.random.RandomState(5)
    waves = jnp.asarray((rng.randn(4, 2000) * 500).astype(np.float32))
    rirs = jnp.asarray((rng.randn(4, 64) * 0.1).astype(np.float32))
    noises = jnp.asarray(rng.randn(4, 2000).astype(np.float32))
    f = jax.jit(lambda w, k: simulate_batch(
        w, k, rirs=rirs, noises=noises, gain_range=(-3.0, 3.0),
        reverb_prob=0.5, noise_prob=0.5))
    out = f(waves, jax.random.PRNGKey(0))
    assert out.shape == waves.shape and np.isfinite(np.asarray(out)).all()
    out2 = f(waves, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))  # reproducible


def test_dataset_simulator_integration(tmp_path):
    from pykaldi2_tpu.config import FrameOpts
    from pykaldi2_tpu.data.dataset import SpeechDataset
    from toydata import make_toy_corpus

    paths = make_toy_corpus(str(tmp_path), num_utts=3, seed=6)
    cfg = SimulationConfig(noise=NoiseConfig(use_noise=True, prob=1.0, snr_range=(20.0, 20.0)))
    sim = Simulator(cfg)
    ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                       frame_opts=FrameOpts(dither=0.0), simulate_fn=sim)
    clean = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                          frame_opts=FrameOpts(dither=0.0))
    u_sim = ds.get(ds.utt_ids[0], np.random.RandomState(0))
    u_clean = clean.get(clean.utt_ids[0])
    assert u_sim.wave.shape == u_clean.wave.shape
    assert not np.allclose(u_sim.wave, u_clean.wave)
    assert u_sim.num_frames == u_clean.num_frames


def test_isotropic_noise_coherence():
    from pykaldi2_tpu.simulation.iso_noise import isotropic_noise
    rng = np.random.RandomState(7)
    # broadband coherence ≈ mean of sinc(2fd/c): high at 1 cm, ~0 at 2 m
    mics = np.array([[0.0, 0, 0], [0.01, 0, 0], [2.0, 0, 0]])
    iso = isotropic_noise(mics, 32000, 16000.0, rng)
    assert iso.shape == (32000, 3)
    c_close = np.corrcoef(iso[:, 0], iso[:, 1])[0, 1]
    c_far = np.corrcoef(iso[:, 0], iso[:, 2])[0, 1]
    assert c_close > 0.6 and abs(c_far) < 0.3, (c_close, c_far)


def test_multichannel_simulator():
    cfg = SimulationConfig(
        reverb=ReverbConfig(use_reverb=True, prob=1.0, rt60_range=(0.1, 0.2)),
        noise=NoiseConfig(use_noise=True, prob=1.0, snr_range=(10.0, 10.0)),
    )
    rng = np.random.RandomState(8)
    wave = (rng.randn(8000) * 2000).astype(np.float32)
    sim1 = Simulator(cfg, num_channels=4, output_channel=1)
    out, _ = sim1.simulate_with_labels(wave, None, np.random.RandomState(1))
    assert out.shape == (8000,) and np.isfinite(out).all()
    sim2 = Simulator(cfg, num_channels=4, output_channel=None)
    out2, _ = sim2.simulate_with_labels(wave, None, np.random.RandomState(1))
    assert out2.shape == (8000, 4)
    assert not np.allclose(out2[:, 0], out2[:, 3])


def test_loader_num_workers_deterministic(tmp_path):
    from pykaldi2_tpu.config import FrameOpts
    from pykaldi2_tpu.data.dataset import SpeechDataset
    from pykaldi2_tpu.data.dataloader import ChunkDataloader
    from toydata import make_toy_corpus

    paths = make_toy_corpus(str(tmp_path), num_utts=6, seed=9)
    cfg = SimulationConfig(noise=NoiseConfig(use_noise=True, prob=1.0, snr_range=(15.0, 15.0)))
    def batches(num_workers):
        ds = SpeechDataset(wav_scp=paths["wav_scp"], ali=paths["ali"],
                           frame_opts=FrameOpts(dither=0.0), simulate_fn=Simulator(cfg))
        loader = ChunkDataloader(ds, batch_size=3, chunk_len=40, shuffle=True,
                                 seed=5, num_workers=num_workers)
        return list(loader)
    b0, b4 = batches(0), batches(4)
    assert len(b0) == len(b4)
    for a, b in zip(b0, b4):
        np.testing.assert_array_equal(a["wave"], b["wave"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_device_simulator_extras_and_pipeline():
    """On-device simulation path: DeviceSimulator samples tensors, the
    pipeline applies reverb/noise/gain inside the (jittable) call."""
    import jax
    import jax.numpy as jnp

    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     NoiseConfig, PerturbConfig, ReverbConfig,
                                     SimulationConfig)
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.simulation.device import DeviceSimulator

    sim = SimulationConfig(
        enabled=True, on_device=True,
        reverb=ReverbConfig(use_reverb=True, prob=1.0, rt60_range=(0.2, 0.3)),
        noise=NoiseConfig(use_noise=True, prob=1.0, snr_range=(5.0, 10.0)),
        perturb=PerturbConfig(use_gain=True, gain_range=(-6.0, 6.0)))
    dev = DeviceSimulator(sim, samp_freq=16000.0)
    B, S = 2, 4000
    extras = dev.batch_extras(["u0", "u1"], n_samples=S)
    assert extras["sim_rir"].shape[0] == B
    assert extras["sim_noise"].shape == (B, S)

    fo = FrameOpts(dither=0.0)
    cfg = FeatConfig(fbank=FbankOpts(frame_opts=fo, mel_opts=MelOpts(num_bins=8)))
    from pykaldi2_tpu.frontend.window import num_frames as _nf

    rng = np.random.RandomState(0)
    T = _nf(S, fo)
    batch = {"wave": jnp.asarray((rng.randn(B, S) * 1000).astype(np.float32)),
             "mask": jnp.ones((B, T), jnp.float32)}
    batch.update({k: jnp.asarray(v) for k, v in extras.items()})

    clean_pipe = FeaturePipeline(cfg)
    sim_pipe = FeaturePipeline(cfg, device_sim_cfg=sim)
    key = jax.random.PRNGKey(0)
    clean = np.asarray(jax.jit(lambda b, k: clean_pipe(b, dither_key=k))(batch, key))
    noisy = np.asarray(jax.jit(lambda b, k: sim_pipe(b, dither_key=k))(batch, key))
    assert np.isfinite(noisy).all()
    assert np.abs(noisy - clean).max() > 0.1     # simulation visibly applied
    # eval copies never simulate
    ev = sim_pipe.for_eval()
    ev_out = np.asarray(ev(batch))
    np.testing.assert_allclose(ev_out, clean, rtol=1e-5, atol=1e-5)


def test_train_ce_cli_on_device_simulation(tmp_path):
    """train_ce with simulation.on_device runs end-to-end and learns."""
    import json
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import yaml
    from toydata import make_toy_corpus
    from pykaldi2_tpu.bin.train_ce import main as ce_main

    paths = make_toy_corpus(str(tmp_path / "c"), num_utts=6, num_pdfs=4, seed=21)
    cfg = {
        "model": {"type": "lstm", "hidden_size": 24, "num_layers": 1,
                  "output_size": 4, "compute_dtype": "float32"},
        "optimizer": {"type": "momentum", "lr": 0.05, "momentum": 0.9},
        "trainer": {"batch_size": 4, "chunk_len": 40, "num_epochs": 2,
                    "log_interval": 1},
        "data": {"wav_scp": paths["wav_scp"], "label_ark": paths["ali"],
                 "feat": {"fbank": {"mel_opts": {"num_bins": 16}}},
                 "simulation": {"enabled": True, "on_device": True,
                                "reverb": {"use_reverb": True, "prob": 0.5,
                                           "rt60_range": [0.15, 0.3]},
                                "noise": {"use_noise": True, "prob": 0.5,
                                          "snr_range": [10, 20]},
                                "perturb": {"use_gain": True}}},
    }
    cp = tmp_path / "ce.yaml"
    yaml.safe_dump(cfg, open(cp, "w"))
    exp = tmp_path / "exp"
    assert ce_main(["-config", str(cp), "-exp_dir", str(exp), "-single_device"]) == 0
    metas = [json.load(open(exp / f"model.{e}.npz.json")) for e in range(2)]
    assert all(np.isfinite(m["loss"]) for m in metas)
    assert metas[1]["loss"] < metas[0]["loss"]
