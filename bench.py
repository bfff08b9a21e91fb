"""Benchmark: CE train-step throughput of the flagship AM on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.json's north-star workload: 4x1024 unidirectional
LSTM, 80-dim fbank computed on device from raw waveforms, ~9k senone outputs,
chunk training (80-frame chunks, batch 64) — the train_ce hot path, including
the on-device front end, CE loss, grad, and optax update.

utt/sec normalization: LibriSpeech-960 averages ≈ 12.3 s/utterance
(281k utts / 960 h) ≈ 1230 frames; utt/sec = frames_per_sec / 1230.

vs_baseline: the driver metadata ships no reference numbers
(BASELINE.json "published": {}, see BASELINE.md) and the reference mount was
empty, so the denominator is an ANALYTIC PROXY, not a measured number:
40 utt/sec (≈49k frames/s) for the same CE workload on one V100 — consistent
with cuDNN-LSTM training throughput at this size. Replace with the measured
reference number when one exists; the ratio is honest only up to that proxy.

Modes (VERDICT r1 item 10 — perf-regression guard):
  python bench.py            → the driver-facing single JSON line (CE)
  python bench.py --check    → CE + MMI + BLSTM runs asserted against floor
                               thresholds; exit 1 on regression (run on the
                               real chip before merging kernel-path changes)
"""

import argparse
import json
import time

import numpy as np

BATCH = 128  # bf16-streamed Pallas LSTM mode; B=64 (fp32 mode) gives 325 utt/s
CHUNK_FRAMES = 80
NUM_PDFS = 8952          # LibriSpeech-ish senone count
FRAMES_PER_UTT = 1230.0  # LibriSpeech-960 mean utterance length in frames
BASELINE_UTT_PER_SEC = 40.0  # analytic V100 proxy — UNVERIFIED, see docstring
WARMUP_STEPS = 3
MEASURE_STEPS = 30

# --check floors: measured round-2 numbers minus ~10% headroom, so refactors
# can't silently lose the Pallas/structured-kernel wins
CHECK_FLOORS = {
    "ce": 385.0,       # 4x1024 LSTM CE, B=128 (r4 re-baseline: 5 runs in one
                       # session mean 406.0 / sigma 3.6 — the 410->402
                       # cross-round "drift" is tunnel noise; floor = mean-5%)
    "mmi": 300.0,      # structured bigram den, B=128, T=400 (measured ~334 r2:
                       # gather/GEMM hoisted out of the FB scan bodies)
    "smbr": 320.0,     # bigram expected-accuracy kernels, B=128 (measured ~358 r2)
    "blstm": 125.0,    # 4x1024 BLSTM CE, B=64 (measured ~140 r1)
    "blstmp": 195.0,   # 4x1024/512 BLSTMP CE, B=64, proj Pallas kernel (~226 r2)
    # mesh-mode CE (shard_map over the local chips): same math as "ce" but
    # exercises the pallas-in-shard_map path (vma plumbing) every round
    "ce_mesh": 330.0,
    # dense state-matmul FB (ops/fb_dense.py): grad(logZ) at the 79k-arc /
    # 5.2k-state bigram den, B=64, T=400, P=8952 — the loaded -den_graph
    # path's 11.9x cumulative win (BASELINE.md r2 session-2: 101.4 ms/step
    # ≈ 205 utt/s); floor set from the r3 on-chip measurement minus ~10%
    "dense_fb": 180.0,
    # banded time-sync lattice MMI fwd+grad (ops/fb_lattice.py) at the
    # worst-case on-the-fly shape B=32/T=448/K=A=256/P=8952. History:
    # r3 matvec form 252 ms ≈ 46.3 utt/s; r5 arc->pdf one-hot GEMM route
    # inverted the ranking (scan 107 ms, matvec 208) and the one-hot
    # Pallas kernels finally lower on chip (bit-exact vs the scan,
    # 106.8 ms, default-on for TPU): measured 107.9 utt/s — the probe
    # lattice is now CONNECTED (self-loop spine; the old fully-random
    # lattice was subcritical and died by frame ~250, see
    # tools/probe_latfb_pallas.py)
    "lat_mmi": 95.0,
    # FULL on-the-fly SE step with the ON-DEVICE decoder (forward + batched
    # beam search over the 79k-arc den HCLG + banded train step; VERDICT r2
    # item 1): measured r5 session-3 12.66 utt/s at B=32/T=448 (search
    # 0.70 s; banded train ~0.16 s: arc->pdf one-hot GEMM route + adaptive
    # band compaction + the Pallas one-hot lattice-FB default — BASELINE.md
    # r5 rows; r4 was 7.46). Long compile through the remote tunnel, but
    # the number is the round-3/4/5 headline — included in the plain bench
    # JSON since r4 (VERDICT r3 missing #2), with one retry on transient
    # tunnel errors.
    "dev_otf": 11.5,
    # block-sparse FB grad(logZ) on the 96k-state chain graph, B=64/T=100
    # (ops/fb_block.py; measured r4 206.8 ms/step = 25.2 utt/s = 4.6x the
    # arc tables, which OOM outright at B=16/T=300). History: 447 ms COO
    # gather/einsum/segment-sum -> 410 ms dense-band matvec -> 255 ms
    # band + full-save backward (no recompute pass under the HBM budget)
    # -> 206.8 ms lincarry + fused-band einsum + bf16 tiles (r4 defaults)
    "block_fb": 22.0,
    # on-device eval decode e2e (B=16/T=300, 300-word bigram HCLG, 38k
    # states): measured r4 5.1 utt/s after the native banded_to_fsas
    # epilogue (5.9 s -> 0.28 s), segment-bound exact top-K, and pipelined
    # host conversion — three separate optimizations with no regression
    # guard until now (VERDICT r4 missing #4)
    "dev_eval": 4.5,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true",
                   help="assert CE/MMI/BLSTM throughput floors (regression guard)")
    args = p.parse_args(argv)
    try:
        return _dispatch(args)
    except Exception:
        # safety net: if a Pallas kernel fails to compile in this environment,
        # fall back to the pure-XLA paths rather than losing the benchmark
        import os
        import traceback

        traceback.print_exc()
        os.environ["PK2_PALLAS_LSTM"] = "0"
        os.environ["PK2_PALLAS_FBANK"] = "0"
        print("retrying with Pallas kernels disabled", flush=True)
        return _dispatch(args)


def _dispatch(args):
    if not args.check:
        utt_per_sec = _measure_ce("lstm", BATCH)
        # VERDICT r2 item 5: the driver JSON must capture every measured axis,
        # not just the headline CE. Extras are best-effort (null on failure)
        # so a single broken path can't lose the whole benchmark line.
        extras = {}
        for name, fn in (
            ("mmi", lambda: _measure_mmi()),
            ("smbr", lambda: _measure_mmi(criterion="smbr")),
            ("blstmp", lambda: _measure_ce("blstm", 64, proj_size=512)),
            ("dense_fb", _measure_dense_fb),
            ("lat_mmi", _measure_banded_lattice),
            ("block_fb", _measure_block_fb),
            ("dev_eval", _measure_device_eval),
            ("dev_otf", _measure_device_otf),
        ):
            # one retry per extra: the known failure mode is a TRANSIENT
            # remote-tunnel transport error (r3 lost a measured 46.3 utt/s
            # to a single "response body closed" — VERDICT r3 weak #1)
            extras[name] = None
            for attempt in range(2):
                try:
                    extras[name] = round(fn(), 3)
                    break
                except Exception:
                    import traceback

                    traceback.print_exc()
                    print(f"extra {name!r} attempt {attempt + 1} failed"
                          + ("; retrying once" if attempt == 0 else ""),
                          flush=True)
        print(json.dumps({
            "metric": "ce_train_utt_per_sec_per_chip",
            "value": round(utt_per_sec, 3),
            "unit": "utt/sec/chip (LibriSpeech-960-normalized, 4x1024 LSTM CE)",
            "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 3),
            **extras,
        }))
        return 0

    import jax

    if jax.default_backend() != "tpu":
        print("bench.py --check needs the real TPU chip (backend="
              f"{jax.default_backend()}); floors are TPU numbers", flush=True)
        return 2
    results = {
        "ce": _measure_ce("lstm", BATCH),
        "ce_mesh": _measure_ce("lstm", BATCH, use_mesh=True),
        "blstm": _measure_ce("blstm", 64),
        "blstmp": _measure_ce("blstm", 64, proj_size=512),
        "mmi": _measure_mmi(),
        "smbr": _measure_mmi(criterion="smbr"),
        "dense_fb": _measure_dense_fb(),
        "lat_mmi": _measure_banded_lattice(),
        "block_fb": _measure_block_fb(),
        "dev_otf": _measure_device_otf(),
        "dev_eval": _measure_device_eval(),
    }
    ok = True
    for name, got in results.items():
        floor = CHECK_FLOORS[name]
        status = "OK" if got >= floor else "REGRESSION"
        ok &= got >= floor
        print(f"{name}: {got:.1f} utt/s (floor {floor:.0f})  {status}", flush=True)
    return 0 if ok else 1


def _measure_ce(model_type: str, batch_size: int, proj_size: int = 0,
                use_mesh: bool = False) -> float:
    import jax

    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import chunk_samples
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_ce_train_step
    from pykaldi2_tpu.utils import make_optimizer

    feat_cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=80))
    )
    feat_fn = FeaturePipeline(feat_cfg)
    mcfg = ModelConfig(type=model_type, input_size=feat_fn.dim, hidden_size=1024,
                       num_layers=4, output_size=NUM_PDFS, compute_dtype="bfloat16",
                       proj_size=proj_size)
    model = build_model(mcfg)
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=0.01, grad_clip=5.0))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    mesh = None
    if use_mesh:
        from pykaldi2_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    step = make_ce_train_step(model, feat_fn, opt, mesh=mesh)

    fo = feat_cfg.fbank.frame_opts
    S = chunk_samples(CHUNK_FRAMES, fo)
    rng = np.random.RandomState(0)
    batch = {
        "wave": jax.device_put((rng.randn(batch_size, S) * 4000).astype(np.float32)),
        "labels": jax.device_put(rng.randint(0, NUM_PDFS, (batch_size, CHUNK_FRAMES)).astype(np.int32)),
        "mask": jax.device_put(np.ones((batch_size, CHUNK_FRAMES), np.float32)),
    }
    key = jax.random.PRNGKey(1)

    for i in range(WARMUP_STEPS):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
    float(m["loss"])  # hard host sync (block_until_ready alone proved
                      # unreliable through the remote-TPU tunnel)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
    final_loss = float(m["loss"])  # device→host copy of a value dependent on
    jax.block_until_ready(params)  # every step — cannot complete early
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    frames_per_sec = MEASURE_STEPS * batch_size * CHUNK_FRAMES / dt
    return frames_per_sec / FRAMES_PER_UTT


def _measure_mmi(batch_size: int = 128, t_len: int = 400,
                 criterion: str = "mmi") -> float:
    """Round-1 MMI workload: whole utterances, structured bigram den graph.

    B=128 default since round 2's FB hoisting: the bigram kernels no longer
    bound the step, so MMI batches like CE (334 utt/s vs 293 at B=64)."""
    import jax

    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import chunk_samples
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel
    from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.ops.fb_bigram import make_bigram_den
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_train_step
    from pykaldi2_tpu.utils import make_optimizer

    n_phones = 41
    tm = TransitionModel(HmmTopology.three_state(range(1, n_phones + 1)))
    rng = np.random.RandomState(0)
    seqs = [rng.randint(1, n_phones + 1, rng.randint(20, 60)).astype(np.int32)
            for _ in range(100)]
    lm = estimate_phone_bigram(seqs, tm.topo.phones)
    den = make_bigram_den(tm, lm, num_pdfs=NUM_PDFS)

    feat_cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=80)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=1024, num_layers=4,
                                    output_size=NUM_PDFS, compute_dtype="bfloat16"))
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=1e-4))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_se_train_step(model, feat_fn, opt, den, criterion, mesh=None,
                              acoustic_scale=0.1, ce_ratio=0.1)

    fo = feat_cfg.fbank.frame_opts
    S = chunk_samples(t_len, fo)
    batch = {
        "wave": jax.device_put((rng.randn(batch_size, S) * 4000).astype(np.float32)),
        "labels": jax.device_put(rng.randint(0, tm.num_pdfs, (batch_size, t_len)).astype(np.int32)),
        "mask": jax.device_put(np.ones((batch_size, t_len), np.float32)),
        "num_frames": jax.device_put(np.full((batch_size,), t_len, np.int32)),
    }
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
    float(m["objective"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        key, sk = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sk)
    obj = float(m["objective"])
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    assert np.isfinite(obj)
    return n * batch_size * t_len / dt / FRAMES_PER_UTT


def _measure_dense_fb(batch_size: int = 64, t_len: int = 400) -> float:
    """grad(logZ) through the dense state-matmul kernels (ops/fb_dense.py)
    at the 79k-arc / 5.2k-state bigram den — the loaded -den_graph hot path
    whose 11.9x win over the arc tables had no regression guard (VERDICT r2
    weak #7)."""
    import jax
    import jax.numpy as jnp

    from pykaldi2_tpu.graph import (HmmTopology, TransitionModel,
                                    estimate_phone_bigram, make_den_graph)
    from pykaldi2_tpu.ops.fb_dense import fsa_logz_dense, pack_graph_dense

    n_phones = 41
    tm = TransitionModel(HmmTopology.three_state(range(1, n_phones + 1)))
    rng = np.random.RandomState(0)
    seqs = [rng.randint(1, n_phones + 1, rng.randint(20, 60)).astype(np.int32)
            for _ in range(100)]
    lm = estimate_phone_bigram(seqs, tm.topo.phones)
    den = pack_graph_dense(make_den_graph(tm, lm))

    obs = jax.device_put(rng.randn(batch_size, t_len, NUM_PDFS).astype(np.float32) * 0.1)
    nf = jax.device_put(np.full(batch_size, t_len, np.int32))
    fn = jax.jit(jax.grad(lambda o: jnp.sum(fsa_logz_dense(o, den, nf))))
    g = fn(obs)
    float(jnp.sum(g))  # hard host sync (see _measure_ce note)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        g = fn(obs)
    s = float(jnp.sum(g))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return n * batch_size * t_len / dt / FRAMES_PER_UTT


def _dev_otf_setup(batch_size: int = 32, t_len: int = 448,
                   criterion: str = "mmi"):
    """Shared builder for the on-the-fly device-decoder measurements:
    returns (graph, forward_fn, train_fn, batch, params, opt_state) at the
    BASELINE.md on-the-fly config (79k-arc pdf-level phone-bigram den HCLG,
    4x1024 LSTM). Used by _measure_device_otf and tools/profile_dev_otf.py
    (the component-itemization profiler, VERDICT r4 item 2b)."""
    import jax

    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts, MelOpts,
                                     ModelConfig, OptimizerConfig)
    from pykaldi2_tpu.data.dataloader import chunk_samples
    from pykaldi2_tpu.decode.device_lattice import (
        device_lattice_generate, pack_decode_graph)
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel
    from pykaldi2_tpu.graph.compile import expand_to_pdf_fst
    from pykaldi2_tpu.graph.fst import EPS, Fst
    from pykaldi2_tpu.graph.phone_lm import estimate_phone_bigram
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline
    from pykaldi2_tpu.trainer import make_se_lattice_steps
    from pykaldi2_tpu.utils import make_optimizer

    n_phones = 41
    tm = TransitionModel(HmmTopology.three_state(range(1, n_phones + 1)))
    rng = np.random.RandomState(0)
    seqs = [rng.randint(1, n_phones + 1, rng.randint(20, 60)).astype(np.int32)
            for _ in range(100)]
    lm = estimate_phone_bigram(seqs, tm.topo.phones)
    # phone-loop den HCLG, exactly as train_se -on_the_fly builds it
    f = Fst()
    start = f.add_state()
    f.set_start(start)
    junction = {p: f.add_state() for p in tm.topo.phones}
    for p in tm.topo.phones:
        if np.isfinite(lm["log_init"][p]):
            f.add_arc(start, p, EPS, float(lm["log_init"][p]), junction[p])
        for q in tm.topo.phones:
            if np.isfinite(lm["log_bigram"][p, q]):
                f.add_arc(junction[p], q, EPS, float(lm["log_bigram"][p, q]),
                          junction[q])
        f.set_final(junction[p], float(lm["log_final"][p]))
    den_fst = expand_to_pdf_fst(f, tm)
    graph = pack_decode_graph(den_fst)
    # declare the den graph's static pdf set, exactly as train_se does:
    # routes the banded kernels' arc→pdf reductions through the one-hot
    # GEMM form (ops/fb_lattice._arc_pdf_sums) instead of the scatter
    from pykaldi2_tpu.ops.fb_lattice import set_den_pdf_ids
    set_den_pdf_ids([a.ilabel - 1 for s_arcs in den_fst.arcs
                     for a in s_arcs if a.ilabel > 0])

    feat_cfg = FeatConfig(
        fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0), mel_opts=MelOpts(num_bins=80)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=1024, num_layers=4,
                                    output_size=NUM_PDFS, compute_dtype="bfloat16"))
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9, lr=1e-4))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    forward_fn, train_fn = make_se_lattice_steps(
        model, feat_fn, opt, acoustic_scale=0.1, ce_ratio=0.1,
        criterion=criterion, obs_transfer_dtype="float32")

    fo = feat_cfg.fbank.frame_opts
    S = chunk_samples(t_len, fo)
    batch = {
        "wave": jax.device_put((rng.randn(batch_size, S) * 4000).astype(np.float32)),
        "labels": jax.device_put(rng.randint(0, tm.num_pdfs, (batch_size, t_len)).astype(np.int32)),
        "mask": jax.device_put(np.ones((batch_size, t_len), np.float32)),
        "num_frames": jax.device_put(np.full((batch_size,), t_len, np.int32)),
    }
    return graph, forward_fn, train_fn, batch, params, opt_state


def _measure_device_otf(batch_size: int = 32, t_len: int = 448,
                        criterion: str = "mmi") -> float:
    """FULL on-the-fly SE step with the ON-DEVICE lattice decoder
    (decode/device_lattice.py; VERDICT r2 item 1): per step = eval forward
    + batched beam search over the 79k-arc pdf-level den HCLG (beam 10 /
    lattice_beam 4 / max_active 200, the BASELINE.md on-the-fly config) +
    banded-lattice train step. No D2H copy, no host decode — the number the
    host path could only PROJECT (~40 utt/s at >=16 cores) is measured here
    on one chip."""
    import jax

    from pykaldi2_tpu.decode.device_lattice import (_compact_band,
                                                    device_lattice_generate)

    graph, forward_fn, train_fn, batch, params, opt_state = _dev_otf_setup(
        batch_size, t_len, criterion)
    key = jax.random.PRNGKey(1)

    def one_step(params, opt_state, key):
        obs = forward_fn(params, batch)
        lat, _scores, _dropped = device_lattice_generate(
            obs, graph, batch["num_frames"], max_active=200, max_arcs=800,
            beam=10.0, lattice_beam=4.0)
        # adaptive band compaction, exactly as train_se's device branch: the
        # FB is ~linear in the band width; slicing to the true-occupancy
        # 128-multiple bucket is lossless (BASELINE.md r5 occupancy row).
        # Costs the one scalar sync per step production pays.
        lat, _ = _compact_band(lat, None)
        key, sk = jax.random.split(key)
        return train_fn(params, opt_state, batch, lat, sk) + (key,)

    for _ in range(2):
        params, opt_state, m, key = one_step(params, opt_state, key)
    float(m["objective"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, m, key = one_step(params, opt_state, key)
    obj = float(m["objective"])
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    assert np.isfinite(obj)
    return n * batch_size * t_len / dt / FRAMES_PER_UTT


def _make_chain_graph(num_chains: int = 3200, chain_len: int = 30,
                      num_pdfs: int = NUM_PDFS, seed: int = 0):
    """~100k-state word-den-shaped graph: linear pdf chains + a shared loop
    state (each chain end emits a shared junction pdf into the loop, the
    loop fans out to every chain start) — the chain/junction structure real
    word-level denominator graphs have."""
    from pykaldi2_tpu.ops.fsa import DenseFsa

    rng = np.random.RandomState(seed)
    S = 1 + num_chains * chain_len
    src, dst, pdf, wt = [], [], [], []
    loop = 0
    state_pdf = np.zeros(S, np.int64)
    state_pdf[1:] = rng.randint(1, num_pdfs, S - 1)
    for c in range(num_chains):
        s0 = 1 + c * chain_len
        src.append(loop)
        dst.append(s0)
        wt.append(-np.log(num_chains))
        for i in range(chain_len - 1):
            src.append(s0 + i)
            dst.append(s0 + i + 1)
            wt.append(-0.1)
            # self-loop (HMM-style durations)
            src.append(s0 + i)
            dst.append(s0 + i)
            wt.append(-2.3)
        src.append(s0 + chain_len - 1)
        dst.append(loop)
        wt.append(-0.1)
    state_pdf[loop] = 0
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    pdf = state_pdf[dst].astype(np.int32)
    final = np.full(S, -np.inf, np.float32)
    final[loop] = 0.0
    return DenseFsa(S, src, dst, pdf, np.asarray(wt, np.float32), final, 0)


def _measure_device_eval(batch_size: int = 16, t_len: int = 300,
                         n_words: int = 300) -> float:
    """Batched EVAL decoding on the chip (bin/decode -decoder device): AM
    forward + device word-lattice search over an ARPA-bigram word HCLG
    (in-frame eps closure) + banded→DenseFsa conversion. utt/s end-to-end —
    the host alternative ships [B,T,P] posteriors over PCIe and decodes
    per-utterance on CPU cores."""
    import jax
    import jax.numpy as jnp

    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts,
                                     MelOpts, ModelConfig)
    from pykaldi2_tpu.data.dataloader import chunk_samples
    from pykaldi2_tpu.decode.device_lattice import (
        banded_to_fsas, device_lattice_generate, pack_decode_graph)
    from pykaldi2_tpu.graph import HmmTopology, TransitionModel
    from pykaldi2_tpu.graph.arpa import arpa_to_fst, train_arpa
    from pykaldi2_tpu.graph.compile import make_word_decode_graph
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline

    rng = np.random.RandomState(0)
    n_phones = 41
    tm = TransitionModel(HmmTopology.three_state(range(1, n_phones + 1)))
    vocab = [f"w{i}" for i in range(n_words)]
    word_ids = {w: i + 1 for i, w in enumerate(vocab)}
    lexicon = {w: [list(rng.randint(1, n_phones + 1,
                                    rng.randint(4, 10)))] for w in vocab}
    sents = [[vocab[rng.randint(n_words)] for _ in range(rng.randint(3, 9))]
             for _ in range(2000)]
    hclg = make_word_decode_graph(
        tm, lexicon, word_ids, arpa_to_fst(train_arpa(sents, order=2),
                                           word_ids)).to_fst()
    graph = pack_decode_graph(hclg, eps_mode="auto", max_in_degree=4096)

    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=80)))
    feat_fn = FeaturePipeline(feat_cfg).for_eval()
    model = build_model(ModelConfig(
        type="lstm", input_size=feat_fn.dim, hidden_size=1024, num_layers=4,
        output_size=tm.num_pdfs, compute_dtype="bfloat16"))
    params = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def forward(batch):
        feats = feat_fn(batch)
        logits = model.apply(params, feats, batch["mask"])
        return 0.1 * jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    fo = feat_cfg.fbank.frame_opts
    S = chunk_samples(t_len, fo)
    batch = {
        "wave": jax.device_put(
            (rng.randn(batch_size, S) * 4000).astype(np.float32)),
        "mask": jax.device_put(np.ones((batch_size, t_len), np.float32)),
        "num_frames": jax.device_put(np.full((batch_size,), t_len,
                                             np.int32)),
    }

    nf_np = np.asarray(batch["num_frames"])

    def dispatch():
        obs = forward(batch)
        lat, _sc, _dropped, olab = device_lattice_generate(
            obs, graph, batch["num_frames"], max_active=200, max_arcs=1024,
            beam=16.0, lattice_beam=10.0, return_olabels=True)
        return lat, olab

    def convert(pend):
        return banded_to_fsas(pend[0], nf_np, olabels=np.asarray(pend[1]))

    framed = convert(dispatch())  # warm both pieces
    # pipelined, as bin/decode runs it: the search dispatch is async, so
    # the chip searches batch i+1 while the host converts batch i
    n = 5
    t0 = time.perf_counter()
    pend = dispatch()
    for _ in range(n - 1):
        nxt = dispatch()
        framed = convert(pend)
        pend = nxt
    framed = convert(pend)
    dt = time.perf_counter() - t0
    assert sum(f.num_arcs for (f, _fr) in framed) > 0
    return n * batch_size / dt


def _measure_block_fb(batch_size: int = 64, t_len: int = 100,
                      arc_table_ref: bool = False) -> float:
    """grad(logZ) through the block-sparse kernels (ops/fb_block.py) on a
    ~96k-state chain graph — past the 16k-state dense cap, where only the
    arc tables used to run (VERDICT r2 item 3: target >=5x the arc tables
    at >=100k states). ``arc_table_ref=True`` measures the arc-table
    kernels on the same graph instead (the old path, for the ratio)."""
    import jax
    import jax.numpy as jnp

    from pykaldi2_tpu.ops.fb import fsa_logz, pack_graph
    from pykaldi2_tpu.ops.fb_block import fsa_logz_block, pack_graph_blocks

    fsa = _make_chain_graph()
    rng = np.random.RandomState(0)
    if arc_table_ref:
        g = pack_graph(fsa)
        fb_fn = fsa_logz
    else:
        g = pack_graph_blocks(fsa)
        fb_fn = fsa_logz_block
    obs = jax.device_put(
        rng.randn(batch_size, t_len, NUM_PDFS).astype(np.float32) * 0.1)
    nf = jax.device_put(np.full(batch_size, t_len, np.int32))
    fn = jax.jit(jax.grad(lambda o: jnp.sum(fb_fn(o, g, nf))))
    grad = fn(obs)
    float(jnp.sum(grad))  # hard host sync (see _measure_ce note)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        grad = fn(obs)
    s = float(jnp.sum(grad))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return n * batch_size * t_len / dt / FRAMES_PER_UTT


def _measure_banded_lattice(batch_size: int = 32, t_len: int = 448,
                            k: int = 256, a: int = 256) -> float:
    """Banded time-sync lattice MMI fwd+grad (ops/fb_lattice.py) at the
    worst-case on-the-fly shape: fully dense [B, T, A] arc bands, K slots
    (BASELINE.md r2 session-2: 277 ms = 42 utt/s; VERDICT r2 weak #4/#7)."""
    import jax
    import jax.numpy as jnp

    from pykaldi2_tpu.ops.fb_lattice import TimeSyncLattice, mmi_objective_lattice_ts

    rng = np.random.RandomState(0)
    lat = TimeSyncLattice(
        src=jax.device_put(rng.randint(0, k, (batch_size, t_len, a)).astype(np.int32)),
        dst=jax.device_put(rng.randint(0, k, (batch_size, t_len, a)).astype(np.int32)),
        pdf=jax.device_put(rng.randint(0, NUM_PDFS, (batch_size, t_len, a)).astype(np.int32)),
        weight=jax.device_put((rng.randn(batch_size, t_len, a) * 0.1).astype(np.float32)),
        final=jax.device_put(np.zeros((batch_size, k), np.float32)),
    )
    obs = jax.device_put(rng.randn(batch_size, t_len, NUM_PDFS).astype(np.float32) * 0.1)
    ali = jax.device_put(rng.randint(0, NUM_PDFS, (batch_size, t_len)).astype(np.int32))
    mask = jax.device_put(np.ones((batch_size, t_len), np.float32))
    nf = jax.device_put(np.full(batch_size, t_len, np.int32))
    fn = jax.jit(jax.grad(lambda o: jnp.sum(
        mmi_objective_lattice_ts(o, ali, lat, nf, mask, True, 1.0))))
    g = fn(obs)
    float(jnp.sum(g))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        g = fn(obs)
    s = float(jnp.sum(g))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return n * batch_size * t_len / dt / FRAMES_PER_UTT


if __name__ == "__main__":
    raise SystemExit(main())
