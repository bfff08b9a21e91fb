"""On-device feature pipeline: waveform batch → normalized features, under jit.

This is the TPU-native fusion point (BASELINE.json: front end as device
kernels "producing HBM-resident batches"): the trainer's jitted step calls
this on the raw waveform batch, so framing/DFT/mel/CMVN/deltas/splicing fuse
with the model's forward pass in one XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pykaldi2_tpu.config import FeatConfig
from pykaldi2_tpu.data import kaldi_io
from pykaldi2_tpu.frontend import (
    add_deltas,
    apply_cmvn,
    compute_fbank,
    compute_mfcc,
    splice_frames,
    utterance_cmvn,
)
from pykaldi2_tpu.frontend.cmvn import cmvn_mean_std


def base_feature_dim(cfg: FeatConfig) -> int:
    if cfg.type == "fbank":
        return cfg.fbank.mel_opts.num_bins + (1 if cfg.fbank.use_energy else 0)
    if cfg.type == "mfcc":
        return cfg.mfcc.num_ceps
    raise ValueError(f"unknown feature type {cfg.type!r}")


def feature_dim(cfg: FeatConfig) -> int:
    """Final model input dim after deltas and splicing."""
    d = base_feature_dim(cfg) * (cfg.delta_order + 1)
    return d * (cfg.splice_left + 1 + cfg.splice_right)


def save_cmvn_stats(path: str, stats: np.ndarray):
    """Write [2, D+1] stats as a Kaldi binary double-matrix file."""
    with open(path, "wb") as f:
        f.write(kaldi_io.BINARY_MARKER)
        kaldi_io.write_matrix(f, np.asarray(stats, np.float64))


def load_cmvn_stats(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        marker = f.read(2)
        if marker != kaldi_io.BINARY_MARKER:
            raise ValueError(f"{path} is not a binary Kaldi matrix")
        return kaldi_io.read_matrix(f)


class FeaturePipeline:
    """Configured wave/feats batch → model-input features, jit-friendly.

    Call with a batch dict (``wave`` [B,S] or ``feats`` [B,T,D]) and the frame
    ``mask`` [B,T]; returns [B, T, feature_dim] fp32.
    """

    def __init__(self, cfg: FeatConfig, cmvn_stats: Optional[np.ndarray] = None,
                 device_sim_cfg=None):
        """device_sim_cfg: a SimulationConfig with on_device=True — the
        jitted call then applies reverb/noise/gain to the waveform batch
        (simulation/device.simulate_batch) before feature extraction, using
        sim_rir/sim_noise rows attached by DeviceSimulator.batch_extras.
        Training-only: eval copies (for_eval) drop it with the dither."""
        self.cfg = cfg
        self.device_sim_cfg = device_sim_cfg
        self.mean = None
        self.scale = None
        if cfg.cmvn.stats_path and cmvn_stats is None:
            cmvn_stats = load_cmvn_stats(cfg.cmvn.stats_path)
        if cmvn_stats is not None:
            self.mean, self.scale = cmvn_mean_std(cmvn_stats, cfg.cmvn.norm_vars)
        # per-speaker CMVN: host-side table; rows reach the jitted path via
        # batch["cmvn_mean"/"cmvn_scale"] attached by batch_extras
        self.speaker_cmvn = None
        if cfg.cmvn.utt2spk and cfg.cmvn.spk_stats_scp:
            from pykaldi2_tpu.frontend.cmvn import SpeakerCmvn

            self.speaker_cmvn = SpeakerCmvn(cfg.cmvn.utt2spk, cfg.cmvn.spk_stats_scp,
                                            cfg.cmvn.norm_means, cfg.cmvn.norm_vars)
        # per-utterance VTLN: quantized warp bank of mel matrices + utt→index
        self.warp_bank = None
        self.utt_warp_id = None
        if cfg.utt2warp:
            from pykaldi2_tpu.frontend.mel import mel_banks

            utt_warp = {}
            with open(cfg.utt2warp) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        utt_warp[parts[0]] = float(parts[1])
            mel_opts = cfg.fbank.mel_opts if cfg.type == "fbank" else cfg.mfcc.mel_opts
            fopts = cfg.fbank.frame_opts if cfg.type == "fbank" else cfg.mfcc.frame_opts
            warps = sorted(set(utt_warp.values()))
            self.warp_values = warps
            self.warp_bank = np.stack(
                [mel_banks(mel_opts, fopts, warp=w) for w in warps]).astype(np.float32)
            index = {w: i for i, w in enumerate(warps)}
            self.utt_warp_id = {u: index[w] for u, w in utt_warp.items()}
            # padding rows / unlisted utts fall back to the most neutral warp
            self._neutral_warp = int(np.argmin(np.abs(np.asarray(warps) - 1.0)))
        self.dim = feature_dim(cfg)

    @property
    def has_extras(self) -> bool:
        """True when batches need per-row extras (speaker CMVN / VTLN)."""
        return self.speaker_cmvn is not None or self.warp_bank is not None

    def batch_extras(self, utt_ids, n_samples=None) -> dict:
        """Host-side per-row arrays for a batch (loaders attach these;
        ``n_samples`` is the batch's waveform length, used by other extras
        providers like DeviceSimulator and ignored here).

        An empty utt_id marks a padding row (masked downstream) and gets
        neutral values; a real utterance missing from the tables raises,
        matching Kaldi's apply-cmvn strictness.
        """
        out = {}
        if self.speaker_cmvn is not None:
            d = self.speaker_cmvn.dim
            rows = [(np.zeros(d, np.float32), np.ones(d, np.float32)) if not u
                    else self.speaker_cmvn.lookup(u) for u in utt_ids]
            out["cmvn_mean"] = np.stack([m for m, _ in rows]).astype(np.float32)
            out["cmvn_scale"] = np.stack([s for _, s in rows]).astype(np.float32)
        if self.warp_bank is not None:
            out["warp_id"] = np.asarray(
                [self.utt_warp_id.get(u, self._neutral_warp) for u in utt_ids],
                np.int32)
        return out

    def for_eval(self) -> "FeaturePipeline":
        """Deterministic copy for eval/alignment/stats paths: dither off.

        (The reference dithers at eval too via Kaldi defaults; here eval is
        deterministic by design — dither only runs in training steps, which
        pass a PRNG key.)"""
        import copy

        out = copy.copy(self)  # shallow: shares stats, swaps config
        out.cfg = copy.deepcopy(self.cfg)
        out.cfg.fbank.frame_opts.dither = 0.0
        out.cfg.mfcc.frame_opts.dither = 0.0
        out.device_sim_cfg = None  # never simulate at eval
        return out

    @staticmethod
    def _pallas_enabled(env_var: str = "PK2_PALLAS_FBANK") -> bool:
        """Env override wins; otherwise fused kernels default to TPU only."""
        import os

        env = os.environ.get(env_var)
        if env is not None:
            return env not in ("0", "false", "")
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    @staticmethod
    def _inside_shard_map(x) -> bool:
        """True when tracing under shard_map replication tracking (the wave
        carries a non-empty varying-axes set). The fused front-end kernels
        compile pathologically slowly there (measured 711 s vs seconds
        outside, 2026-08-16) for a ~3%-of-step runtime win, so mesh-mode
        steps default to the XLA front end; PK2_PALLAS_FBANK=1 forces the
        kernels regardless."""
        import os

        if os.environ.get("PK2_PALLAS_FBANK") not in (None, "", "0", "false"):
            return False  # explicit opt-in wins
        try:
            return bool(jax.typeof(x).vma)
        except (AttributeError, TypeError):
            return False

    def _use_fused(self, dither_key, wave=None) -> bool:
        """Pallas fused fbank kernel for the standard log-power fbank path;
        dithered batches fall back to the XLA path (the kernel has no PRNG)."""
        fb = self.cfg.fbank
        if fb.frame_opts.dither != 0.0 or fb.use_energy \
                or not fb.use_log_fbank or not fb.use_power:
            return False
        if wave is not None and self._inside_shard_map(wave):
            return False
        return self._pallas_enabled()

    def _use_fused_mfcc(self, wave=None) -> bool:
        mf = self.cfg.mfcc
        if mf.frame_opts.dither != 0.0 or (mf.use_energy and not mf.raw_energy):
            return False
        if wave is not None and self._inside_shard_map(wave):
            return False
        return self._pallas_enabled()

    def _simulate_on_device(self, batch: dict, key) -> jax.Array:
        """Apply the on-device reverb/noise/gain stage (SimulationConfig with
        on_device=True) to the waveform batch inside the jitted step."""
        from pykaldi2_tpu.simulation.device import simulate_batch

        sim = self.device_sim_cfg
        wave = batch["wave"]
        sample_mask = None
        mask = batch.get("mask")
        if mask is not None:
            # approximate per-sample validity from the frame mask so padded
            # rows don't skew the SNR's speech-power estimate
            fo = (self.cfg.fbank.frame_opts if self.cfg.type == "fbank"
                  else self.cfg.mfcc.frame_opts)
            sm = jnp.repeat(mask.astype(jnp.float32), fo.window_shift, axis=-1)
            s = wave.shape[-1]
            if sm.shape[-1] < s:
                sm = jnp.pad(sm, [(0, 0), (0, s - sm.shape[-1])])
            sample_mask = sm[..., :s]
        return simulate_batch(
            wave, jax.random.fold_in(key, 7),
            rirs=batch.get("sim_rir") if sim.reverb.use_reverb else None,
            noises=batch.get("sim_noise") if sim.noise.use_noise else None,
            snr_range=tuple(sim.noise.snr_range),
            gain_range=tuple(sim.perturb.gain_range) if sim.perturb.use_gain else None,
            reverb_prob=sim.reverb.prob, noise_prob=sim.noise.prob,
            sample_mask=sample_mask)

    def __call__(self, batch: dict, dither_key=None) -> jax.Array:
        cfg = self.cfg
        if (self.device_sim_cfg is not None and dither_key is not None
                and "wave" in batch):
            batch = dict(batch)
            batch["wave"] = self._simulate_on_device(batch, dither_key)
            dither_key = jax.random.fold_in(dither_key, 1)
        warp_sel = batch.get("warp_id") if self.warp_bank is not None else None
        if "feats" in batch:
            feats = batch["feats"].astype(jnp.float32)
        elif cfg.type == "fbank":
            if warp_sel is not None:
                feats = compute_fbank(batch["wave"], cfg.fbank, dither_key=dither_key,
                                      mel_weights=jnp.asarray(self.warp_bank),
                                      warp_select=warp_sel)
            elif self._use_fused(dither_key, batch["wave"]):
                from pykaldi2_tpu.frontend.fused import fused_fbank

                feats = fused_fbank(batch["wave"], cfg.fbank)
            else:
                feats = compute_fbank(batch["wave"], cfg.fbank, dither_key=dither_key)
        elif warp_sel is not None:
            feats = compute_mfcc(batch["wave"], cfg.mfcc, dither_key=dither_key,
                                 mel_weights=jnp.asarray(self.warp_bank),
                                 warp_select=warp_sel)
        elif self._use_fused_mfcc(batch["wave"]):
            from pykaldi2_tpu.frontend.fused import fused_mfcc

            feats = fused_mfcc(batch["wave"], cfg.mfcc)
        else:
            feats = compute_mfcc(batch["wave"], cfg.mfcc, dither_key=dither_key)
        mask = batch.get("mask")
        if "cmvn_mean" in batch:
            # per-speaker CMVN rows (SpeakerCmvn.batch via batch_extras)
            feats = apply_cmvn(feats, batch["cmvn_mean"][:, None, :],
                               batch["cmvn_scale"][:, None, :], cfg.cmvn.norm_means)
        elif self.mean is not None:
            feats = apply_cmvn(feats, jnp.asarray(self.mean), jnp.asarray(self.scale),
                               cfg.cmvn.norm_means)
        elif cfg.cmvn.norm_means:
            feats = utterance_cmvn(feats, cfg.cmvn.norm_vars, mask=mask)
        if cfg.delta_order > 0:
            feats = add_deltas(feats, cfg.delta_order, cfg.delta_window)
        if cfg.splice_left or cfg.splice_right:
            feats = splice_frames(feats, cfg.splice_left, cfg.splice_right)
        return feats


def compose_extras(*fns):
    """Merge several ``(utt_ids, n_samples) → dict`` extras providers into
    one loader hook (FeaturePipeline.batch_extras + DeviceSimulator etc.);
    None entries are skipped; returns None when nothing remains."""
    fns = [f for f in fns if f is not None]
    if not fns:
        return None

    def extras(utt_ids, n_samples=None):
        out = {}
        for f in fns:
            out.update(f(utt_ids, n_samples))
        return out

    return extras

def build_frontend(data_cfg):
    """(dataset, feat_fn, extras_fn) for the trainers, honoring on-device
    simulation: with simulation.on_device, reverb/noise/gain move into the
    jitted step (DeviceSimulator samples the tensors; FeaturePipeline
    applies them) and the host keeps only duration-changing speed
    perturbation.

    Note: -on_the_fly SE decodes denominator lattices from the UNdistorted
    forward (eval pipeline) while training applies the distortion — prefer
    host-side simulation (on_device: false) for that mode so lattices and
    gradients see the same audio."""
    import copy

    from pykaldi2_tpu.data.dataset import SpeechDataset

    sim = data_cfg.simulation
    dev_sim = None
    dev_cfg = None
    dcfg = data_cfg
    if sim.enabled and sim.on_device:
        if not (data_cfg.wav_scp or (data_cfg.hdf5 and data_cfg.hdf5_kind == "wave")):
            raise ValueError(
                "simulation.on_device needs a waveform corpus (wav_scp or "
                "hdf5 kind=wave); feats-mode corpora would silently skip "
                "the distortion stage")
        dcfg = copy.deepcopy(data_cfg)
        host = dcfg.simulation
        host.reverb.use_reverb = False
        host.noise.use_noise = False
        host.perturb.use_gain = False
        host.enabled = host.perturb.use_speed
        fo = (data_cfg.feat.fbank.frame_opts if data_cfg.feat.type == "fbank"
              else data_cfg.feat.mfcc.frame_opts)
        from pykaldi2_tpu.simulation.device import DeviceSimulator

        dev_sim = DeviceSimulator(sim, samp_freq=fo.samp_freq,
                                  frame_shift=fo.window_shift)
        dev_cfg = sim
    dataset = SpeechDataset.from_config(dcfg)
    feat_fn = FeaturePipeline(data_cfg.feat, device_sim_cfg=dev_cfg)
    extras_fn = compose_extras(
        feat_fn.batch_extras if feat_fn.has_extras else None,
        dev_sim.batch_extras if dev_sim is not None else None)
    return dataset, feat_fn, extras_fn
