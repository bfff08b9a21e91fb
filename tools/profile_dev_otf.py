"""Itemize the on-the-fly device-decoder SE step (VERDICT r4 item 2b).

The r4 sweep recorded the B=32 step as "search 0.833 s + banded train
1.159 s" without saying where the train second goes: the lat_mmi bench
kernel is 0.25 s at A=256, but the OTF step searches with max_arcs=800 and
carries a CE-smoothing term, a second (eval) forward, and the optimizer.
This tool times each component as its own XLA program (2 warmups, n reps,
one sync) at the exact `bench.py _measure_device_otf` config, plus an
A=256 variant to expose the band-width scaling.

Run on the real chip:  PK2_PLATFORM=tpu python tools/profile_dev_otf.py
Prints one JSON line per component and a summary accounting.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, sync, n=10, warmup=2):
    """fn() dispatches; sync(result) forces completion of the whole result.

    sync MUST pull a host scalar data-dependent on every output leaf
    (float() of a device-side sum): through the axon tunnel,
    block_until_ready returns at enqueue time for fast programs and
    under-measures by 1000x (repo rule; first version of this tool read
    the 0.83 s search as 0.2 ms)."""
    r = None
    for _ in range(warmup):
        r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / n


def _sync_scalar(r):
    """One device-side f32 sum over every numeric leaf, one float() pull."""
    import jax
    import jax.numpy as jnp

    total = None
    for x in jax.tree_util.tree_leaves(r):
        if not hasattr(x, "dtype"):
            continue
        s = jnp.sum(x.astype(jnp.float32))
        total = s if total is None else total + s
    assert total is not None
    np.float32(float(total))  # host pull = completion fence


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from pykaldi2_tpu.config import OptimizerConfig
    from pykaldi2_tpu.decode.device_lattice import device_lattice_generate
    from pykaldi2_tpu.trainer import make_ce_train_step
    from pykaldi2_tpu.utils import make_optimizer

    def note(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", flush=True)

    note("devices: %s" % (jax.devices(),))
    B, T, P = 32, 448, bench.NUM_PDFS
    note("setup (graph build + pack + device_put)...")
    graph, forward_fn, train_fn, batch, params, opt_state = \
        bench._dev_otf_setup(B, T, "mmi")
    note("setup done")
    key = jax.random.PRNGKey(1)
    out = {}

    sync_tree = _sync_scalar

    # 1. eval forward (feat pipeline + LSTM fwd + acoustic_scores)
    note("compiling/timing fwd...")
    out["fwd"] = _time(lambda: forward_fn(params, batch), sync_tree)
    obs = forward_fn(params, batch)
    jax.block_until_ready(obs)

    # 2. batched beam search at the bench config (max_arcs=800) and at 256
    for a in (800, 256):
        def search():
            return device_lattice_generate(
                obs, graph, batch["num_frames"], max_active=200, max_arcs=a,
                beam=10.0, lattice_beam=4.0)
        out[f"search_a{a}"] = _time(search, sync_tree)
        if a == 800:
            lat, _sc, _dropped = search()
            jax.block_until_ready(lat)

    # 3. full banded train step on a FIXED lattice (fwd+bwd+opt+CE smoothing)
    def train():
        return train_fn(params, opt_state, batch, lat, key)
    out["train"] = _time(train, sync_tree)

    # 4. the lattice-FB kernel alone at the TRUE searched band shape:
    # value_and_grad of the banded MMI objective wrt obs
    from pykaldi2_tpu.ops.fb_lattice import mmi_objective_lattice_ts

    sup = jnp.asarray(np.ones((B, T), np.float32))
    labels = batch["labels"]
    nf = batch["num_frames"]

    @jax.jit
    def latfb(o):
        def f(o32):
            rows = mmi_objective_lattice_ts(o32, labels, lat, nf, sup,
                                            True, 1.0)
            return jnp.sum(rows)
        return jax.value_and_grad(f)(o.astype(jnp.float32))

    out["latfb_fwd_grad"] = _time(lambda: latfb(obs), sync_tree)

    # 5. CE-only train step on the same model/batch (model fwd+bwd+opt,
    # no lattice): the "everything but the lattice term" bound
    from pykaldi2_tpu.config import (FbankOpts, FeatConfig, FrameOpts,
                                     MelOpts, ModelConfig)
    from pykaldi2_tpu.models import build_model
    from pykaldi2_tpu.pipeline import FeaturePipeline

    feat_cfg = FeatConfig(fbank=FbankOpts(frame_opts=FrameOpts(dither=0.0),
                                          mel_opts=MelOpts(num_bins=80)))
    feat_fn = FeaturePipeline(feat_cfg)
    model = build_model(ModelConfig(type="lstm", input_size=feat_fn.dim,
                                    hidden_size=1024, num_layers=4,
                                    output_size=P,
                                    compute_dtype="bfloat16"))
    opt = make_optimizer(OptimizerConfig(type="momentum", momentum=0.9,
                                         lr=1e-4))
    ce_params = model.init(jax.random.PRNGKey(0))
    ce_opt = opt.init(ce_params)
    ce_step = make_ce_train_step(model, feat_fn, opt, donate=False)
    out["ce_train"] = _time(
        lambda: ce_step(ce_params, ce_opt, batch, key), sync_tree)

    # 6. the combined step (what bench.py reports), for cross-checking that
    # the components add up (a gap = host/dispatch time the tunnel hides)
    def full():
        o = forward_fn(params, batch)
        l, _s, _d = device_lattice_generate(
            o, graph, batch["num_frames"], max_active=200, max_arcs=800,
            beam=10.0, lattice_beam=4.0)
        return train_fn(params, opt_state, batch, l, key)
    out["full_step"] = _time(full, sync_tree)

    for k, v in out.items():
        print(json.dumps({"component": k, "ms": round(v * 1e3, 1)}),
              flush=True)
    acct = {
        "sum_fwd_search_train_ms": round(
            (out["fwd"] + out["search_a800"] + out["train"]) * 1e3, 1),
        "full_step_ms": round(out["full_step"] * 1e3, 1),
        "train_minus_latfb_minus_ce_ms": round(
            (out["train"] - out["latfb_fwd_grad"] - out["ce_train"]) * 1e3,
            1),
        "search_a800_vs_a256_ms": [round(out["search_a800"] * 1e3, 1),
                                   round(out["search_a256"] * 1e3, 1)],
        "utt_per_sec_full": round(B * T / out["full_step"] /
                                  bench.FRAMES_PER_UTT, 2),
    }
    print(json.dumps({"summary": acct}), flush=True)


if __name__ == "__main__":
    main()
