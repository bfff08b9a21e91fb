"""Frame cross-entropy trainer entry point.

Reference behavior: pykaldi2/bin/train_ce.py (SURVEY.md §4.1) — same CLI
shape: ``python -m pykaldi2_tpu.bin.train_ce -config exp.yaml -data data.yaml
-exp_dir exp/ce [-lr ...] [-batch_size ...]``. Horovod launch is replaced by
the device mesh: all local chips join the 'data' axis automatically;
multihost adds jax.distributed.initialize.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from pykaldi2_tpu.config import load_config, load_data_config
from pykaldi2_tpu.data.dataloader import ChunkDataloader
from pykaldi2_tpu.data.dataset import SpeechDataset
from pykaldi2_tpu.data.prefetch import device_prefetch
from pykaldi2_tpu.models import build_model
from pykaldi2_tpu.parallel.mesh import equalized_steps, local_batch_sharding, make_mesh
from pykaldi2_tpu.pipeline import FeaturePipeline, build_frontend, feature_dim
from pykaldi2_tpu.trainer import Throughput, make_ce_train_step
from pykaldi2_tpu.utils import (
    MetricsLogger,
    latest_checkpoint,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    setup_logging,
)
from pykaldi2_tpu.utils.lr import PlateauAnnealer, set_lr_scale


def build_argparser():
    p = argparse.ArgumentParser(description="frame-CE acoustic model training")
    p.add_argument("-config", default=None, help="model/optimizer/trainer YAML")
    p.add_argument("-data", default=None, help="corpus/simulation YAML")
    p.add_argument("-cv_data", default=None,
                   help="held-out corpus YAML; per-epoch CV loss drives LR "
                        "annealing (reference behavior) instead of train loss")
    p.add_argument("-exp_dir", required=True)
    p.add_argument("-lr", type=float, default=None)
    p.add_argument("-batch_size", type=int, default=None)
    p.add_argument("-num_epochs", type=int, default=None)
    p.add_argument("-sweep_size", type=float, default=None)
    p.add_argument("-seed_model", default=None, help="warm-start params only")
    p.add_argument("-resume_from_model", default=None, help="resume params+optimizer")
    p.add_argument("-dropout", type=float, default=None)
    p.add_argument("-log_interval", type=int, default=None)
    p.add_argument("-multihost", action="store_true",
                   help="multi-host bring-up: jax.distributed.initialize(); "
                        "data sharded by process, mesh over all hosts' chips")
    p.add_argument("-debug_nans", action="store_true",
                   help="enable jax_debug_nans (sanitizer mode, SURVEY.md §6.2)")
    p.add_argument("-single_device", action="store_true", help="no mesh (debug)")
    p.add_argument("-profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the first steps into DIR")
    return p


def main(argv=None):
    from pykaldi2_tpu.utils import apply_platform_env

    apply_platform_env()
    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config)
    if args.data:
        cfg.data = load_data_config(args.data)
    for name in ("lr",):
        if getattr(args, name) is not None:
            setattr(cfg.optimizer, name, getattr(args, name))
    for name in ("batch_size", "num_epochs", "sweep_size", "log_interval"):
        if getattr(args, name) is not None:
            setattr(cfg.trainer, name, getattr(args, name))
    if args.dropout is not None:
        cfg.model.dropout = args.dropout
    cfg.trainer.exp_dir = args.exp_dir

    if args.multihost and not jax.distributed.is_initialized():
        # launchers (tests, cluster wrappers) may have initialized already
        # with explicit coordinator/process args; a second call raises
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    log = setup_logging(args.exp_dir)
    metrics_log = MetricsLogger(args.exp_dir)
    mesh = None if args.single_device else make_mesh(cfg.trainer.mesh_shape)
    n_dev = 1 if mesh is None else mesh.size
    if cfg.trainer.batch_size % n_dev:
        raise SystemExit(f"batch_size {cfg.trainer.batch_size} not divisible by {n_dev} devices")
    log.info("devices: %s (mesh=%s)", jax.devices(), None if mesh is None else dict(zip(mesh.axis_names, mesh.devices.shape)))

    dataset, feat_fn, extras_fn = build_frontend(cfg.data)
    cv_dataset = None
    if args.cv_data:
        from pykaldi2_tpu.config import load_data_config as _ldc
        cv_cfg = _ldc(args.cv_data)
        cv_cfg.feat = cfg.data.feat  # same features as training
        cv_cfg.simulation.enabled = False
        cv_dataset = SpeechDataset.from_config(cv_cfg)
    cfg.model.input_size = feat_fn.dim
    model = build_model(cfg.model)
    optimizer = make_optimizer(cfg.optimizer)

    key = jax.random.PRNGKey(cfg.trainer.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key)
    opt_state = optimizer.init(params)
    start_epoch = 0
    resume_meta = {}

    resume = args.resume_from_model or latest_checkpoint(args.exp_dir)
    if resume:
        params, opt_state2, resume_meta = load_checkpoint(resume, params, opt_state)
        if opt_state2 is not None:
            opt_state = opt_state2
        start_epoch = int(resume_meta.get("epoch", -1)) + 1
        log.info("resumed from %s (epoch %d)", resume, start_epoch)
    elif args.seed_model:
        params, _, _ = load_checkpoint(args.seed_model, params)
        log.info("seeded params from %s", args.seed_model)

    train_step = make_ce_train_step(model, feat_fn, optimizer, mesh,
                                    grad_compression=cfg.optimizer.grad_compression)
    eval_step = None
    if cv_dataset is not None:
        from pykaldi2_tpu.trainer import make_eval_step
        eval_step = make_eval_step(model, feat_fn, mesh)
    sharding = None if mesh is None else local_batch_sharding(mesh)
    annealer = PlateauAnnealer(cfg.optimizer.anneal_factor, cfg.optimizer.anneal_patience)
    opt_state = annealer.restore_from_checkpoint(resume_meta, opt_state)

    num_params = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(params))
    log.info("model: %s input=%d params=%.2fM output=%d",
             cfg.model.type, feat_fn.dim, num_params / 1e6, cfg.model.output_size)

    from pykaldi2_tpu.utils.profiling import maybe_trace

    profile_steps = 20 if args.profile else 0
    step_no = 0
    procs = jax.process_count()
    for epoch in range(start_epoch, cfg.trainer.num_epochs):
        sweep_world = max(int(round(1.0 / max(cfg.trainer.sweep_size, 1e-6))), 1)
        loader = ChunkDataloader(
            dataset, cfg.trainer.batch_size // jax.process_count(), cfg.trainer.chunk_len,
            # sweep_size < 1 visits a rotating 1/sweep_size slice per epoch
            # (reference -sweep_size semantics: fraction of data per sweep)
            rank=(jax.process_index() * sweep_world + epoch % sweep_world),
            world_size=jax.process_count() * sweep_world,
            shuffle=cfg.data.shuffle, seed=cfg.trainer.seed,
            num_workers=cfg.data.num_workers,
            extras_fn=extras_fn, chunk_overlap=cfg.trainer.chunk_overlap,
        )
        loader.set_epoch(epoch)
        # equalize steps across hosts or the final psum deadlocks
        batch_iter = equalized_steps(loader, iter(loader))
        tp = Throughput()
        ep_nll = ep_frames = 0.0
        synced_frames = 0.0
        for batch in device_prefetch(batch_iter, sharding=sharding):
            key, step_key = jax.random.split(key)
            if step_no == 2 and profile_steps:  # skip compile steps
                profiler_ctx = maybe_trace(args.profile)
                profiler_ctx.__enter__()
            params, opt_state, m = train_step(params, opt_state, batch, step_key)
            step_no += 1
            if profile_steps and step_no == 2 + profile_steps:
                jax.block_until_ready(m["loss"])
                profiler_ctx.__exit__(None, None, None)
                log.info("profiler trace written to %s", args.profile)
                profile_steps = 0
            # lazy device-scalar accumulation: per-step float() pulls are
            # blocking round trips (a tunnel RPC each on remote devices)
            # that drain the prefetch run-ahead; frames for the throughput
            # log are settled in bulk at log_interval
            ep_nll = ep_nll + m["loss"] * m["frames"]
            ep_frames = ep_frames + m["frames"]  # psum'd over mesh → global
            tp.update(cfg.trainer.batch_size // procs, 0.0)
            if step_no % cfg.trainer.log_interval == 0:
                gf = float(ep_frames)
                # per-process rates (the reference logs per-rank
                # throughput): global frame count / process_count
                tp.update(0, (gf - synced_frames) / procs)
                synced_frames = gf
                u_s, f_s = tp.rates()
                log.info("epoch %d step %d loss %.4f acc %.4f | %.1f utt/s %.0f frames/s",
                         epoch, step_no, float(m["loss"]),
                         float(m["frame_acc"]), u_s, f_s)
                metrics_log.log(epoch=epoch, step=step_no,
                                loss=float(m["loss"]),
                                frame_acc=float(m["frame_acc"]),
                                utt_per_sec=u_s, frames_per_sec=f_s)
        ep_loss = float(ep_nll) / max(float(ep_frames), 1.0)
        anneal_loss = ep_loss
        if eval_step is not None:
            cv_nll = cv_frames = 0.0
            cv_loader = ChunkDataloader(cv_dataset,
                                        cfg.trainer.batch_size // jax.process_count(),
                                        cfg.trainer.chunk_len,
                                        rank=jax.process_index(),
                                        world_size=jax.process_count(), shuffle=False,
                                        extras_fn=(feat_fn.batch_extras
                                                   if feat_fn.has_extras else None),
                                        chunk_overlap=cfg.trainer.chunk_overlap)
            # CV also psums globally: equalize or a longer host deadlocks all
            cv_iter = equalized_steps(cv_loader, iter(cv_loader))
            for cb in device_prefetch(cv_iter, sharding=sharding):
                nll, cnt, _cor = eval_step(params, cb)
                cv_nll += float(nll)
                cv_frames += float(cnt)
            anneal_loss = cv_nll / max(cv_frames, 1.0)
            log.info("epoch %d cv loss %.4f", epoch, anneal_loss)
            metrics_log.log(epoch=epoch, cv_loss=anneal_loss)
        scale = annealer.step(anneal_loss)
        opt_state = set_lr_scale(opt_state, scale)
        ckpt = os.path.join(args.exp_dir, f"model.{epoch}.npz")
        save_checkpoint(ckpt, params, opt_state,
                        {"epoch": epoch, "loss": ep_loss, "lr_scale": scale,
                         "anneal": annealer.state()})
        log.info("epoch %d done: loss %.4f lr_scale %.3g → %s", epoch, ep_loss, scale, ckpt)
        metrics_log.log(epoch=epoch, epoch_loss=ep_loss, lr_scale=scale)
    metrics_log.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
