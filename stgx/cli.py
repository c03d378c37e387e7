"""CLI: ``python -m stgx.cli {train|test|benchmark} [--config F] [--set k=v]``.

The stgx counterpart of the reference's main.py subcommands
(/root/reference/main.py:42-223): each follows the same spine — build data,
classes, model, strategy objects; run; write CSV artifacts. Artifacts match
the reference's set: accuracy.csv, train-validation-curve.csv, macro-F1@k.csv,
edit.csv, confusion-matrix.csv, segmentation-<i>.csv, latency.csv,
model-size.csv (SURVEY.md §5.5).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time

import numpy as np


def _log_factory(job):
    """Route log lines to ``job.log[0]`` and stderr to ``job.log[1]`` when
    set (the reference prints through ``file=job_conf['log'][0]``,
    processor.py:478,608,722; ``[null, null]`` in its shipped configs means
    stdout/stderr). The stderr redirect is idempotent (only ever replaces
    the process's original stderr) and restorable via ``log.restore()`` —
    library callers running several commands in one process don't stack
    redirections."""
    import atexit

    out_path, err_path = (list(job.get("log") or [None, None]) + [None])[:2]
    stream = sys.stdout
    if out_path:
        stream = open(out_path, "a", buffering=1)
        atexit.register(stream.close)
    err_stream = None
    if err_path and sys.stderr is sys.__stderr__:
        err_stream = open(err_path, "a", buffering=1)
        atexit.register(err_stream.close)
        sys.stderr = err_stream

    def log(msg):
        # after restore() the file stream is closed; fall back to stdout so
        # a stale reference to this logger can't raise on a closed handle
        target = stream if not stream.closed else sys.stdout
        print(msg, flush=True, file=target)

    def restore():
        """Undo the redirects AND release the file handles, so library
        callers running several commands in one process don't accumulate
        open append streams (one pair per _log_factory call otherwise)."""
        if err_stream is not None:
            if sys.stderr is err_stream:
                sys.stderr = sys.__stderr__
            if not err_stream.closed:
                err_stream.close()
                atexit.unregister(err_stream.close)
        if stream is not sys.stdout and not stream.closed:
            stream.close()
            atexit.unregister(stream.close)

    log.restore = restore
    return log


def _build_all(cfg):
    import jax

    from stgx.config import build_model
    from stgx.data import SkeletonDirDataset, class_distribution, load_actions
    from stgx.parallel.loop import (
        MODEL_EPOCH_ARG,
        MODEL_KIND,
        OptimizerConfig,
        Trainer,
    )
    from stgx.parallel.mesh import make_mesh
    from stgx.utils import LOSS, STATISTICS

    proc, arch, opt, job = cfg["processor"], cfg["arch"], cfg["optimizer"], cfg["job"]
    if arch.get("gcn_impl"):
        from stgx.ops.graph_conv import set_gcn_impl

        set_gcn_impl(arch["gcn_impl"])
    if arch.get("rt_fused"):
        from stgx.ops.rt_fused import set_rt_fused

        set_rt_fused(bool(arch["rt_fused"]))
    data_dir = proc["data"]
    if proc.get("dataset_type", "dir") == "file":
        # single mmap'd file per split: {data}/{split}_data.npy +
        # {data}/{split}_label.pkl (the intended behavior of the reference's
        # bitrotted file path, SURVEY.md §5.9)
        from stgx.data import SkeletonFileDataset

        train_ds = SkeletonFileDataset(
            os.path.join(data_dir, "train_data.npy"),
            os.path.join(data_dir, "train_label.pkl"),
        )
        val_ds = SkeletonFileDataset(
            os.path.join(data_dir, "val_data.npy"),
            os.path.join(data_dir, "val_label.pkl"),
        )
    else:
        train_ds = SkeletonDirDataset(
            os.path.join(data_dir, "train", "features"),
            os.path.join(data_dir, "train", "labels"),
        )
        val_ds = SkeletonDirDataset(
            os.path.join(data_dir, "val", "features"),
            os.path.join(data_dir, "val", "labels"),
        )
    actions = load_actions(proc["actions"])
    num_classes = len(actions)
    class_dist = class_distribution(train_ds, num_classes)

    # overlap host trial loading with device steps (processor.py:61-84's
    # DataLoader workers, thread-pool form)
    from stgx.data import PrefetchedDataset

    prefetch = proc.get("prefetch", 4)
    if prefetch:
        train_ds = PrefetchedDataset(train_ds, ahead=prefetch)
        val_ds = PrefetchedDataset(val_ds, ahead=prefetch)

    model = build_model(cfg, num_classes)
    name = proc["model"]
    loss = LOSS[name](class_dist, arch.get("output_type", "logits"))

    mesh_conf = job.get("mesh") or {}
    mesh = None
    if (
        (mesh_conf.get("data") or 0) > 1
        or (mesh_conf.get("seq") or 1) > 1
        or (mesh_conf.get("model") or 1) > 1
    ):
        mesh = make_mesh(
            data=mesh_conf.get("data"),
            seq=mesh_conf.get("seq", 1),
            model=mesh_conf.get("model", 1),
        )

    trainer = Trainer(
        model=model,
        kind=MODEL_KIND[name],
        loss=loss,
        opt=OptimizerConfig(
            learning_rate=opt["learning_rate"],
            learning_rate_decay=opt["learning_rate_decay"],
            batch_size=opt["batch_size"],
            epochs=opt["epochs"],
            seed=opt["seed"],
            checkpoint_indices=tuple(opt.get("checkpoint_indices", ())),
        ),
        mesh=mesh,
        receptive_field=arch.get("receptive_field", 50),
        segment=arch.get("segment"),
        trial_batch=opt.get("trial_batch", 1),
        compute_dtype=opt.get("compute_dtype"),
        pipeline=bool(arch.get("pipeline")),
        statistics=STATISTICS[name](),
        pass_epoch=name in MODEL_EPOCH_ARG,
    )
    return trainer, train_ds, val_ds, actions, num_classes


def maybe_graft_teacher(cfg, trainer, params, log=print):
    """``arch["shift-gcn++"]["teacher_checkpoint"]``: load a trained teacher
    (an orbax checkpoint from a ``shift-gcn++-teacher`` train run) into the
    distillation wrapper's ``params["teacher"]`` subtree — the stgx
    counterpart of the reference's ``torch.load(teacher_model)`` +
    ``t_net.load_state_dict`` (/root/reference/models/shiftgcn_plus/
    shiftgcn_plus.py:595-607). No-op when the key is unset or the model is
    not the distillation wrapper."""
    sub = cfg["arch"].get("shift-gcn++", {})
    path = sub.get("teacher_checkpoint")
    if not path or cfg["processor"]["model"] != "shift-gcn++":
        return params
    from stgx.models.shiftgcn_plus import graft_teacher_params
    from stgx.utils.checkpoint import restore_params

    teacher = restore_params(path, {"params": params["params"]["teacher"]})
    params = trainer.place_params(graft_teacher_params(params, teacher))
    log(f"grafted trained teacher from {path}")
    return params


def maybe_import_torch_checkpoint(cfg, trainer, params, opt_state, log=print,
                                  want_optimizer=True):
    """``processor.torch_checkpoint``: initialize from a reference-trained
    PyTorch checkpoint (stgx/utils/torch_import.py) — the no-retrain
    migration path. Re-places the imported host arrays with the trainer's
    mesh layout (TP sharding included), rebuilds the optimizer state (with
    the reference's Adam moments when the checkpoint carries them), and
    returns the saved epoch for resume. No-op when the key is unset.

    Set ``processor.torch_resume`` to ``false`` to import the weights only
    (fresh optimizer, epoch 0) — e.g. to fine-tune a finished reference run
    rather than resume it.

    Returns ``(params, opt_state, epoch_or_none)``."""
    path = cfg["processor"].get("torch_checkpoint")
    if not path:
        return params, opt_state, None
    import torch

    from stgx.utils.torch_import import (
        import_reference_optimizer,
        import_reference_state_dict,
    )

    name = cfg["processor"]["model"]
    resume = cfg["processor"].get("torch_resume", True)
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    params = trainer.place_params(
        import_reference_state_dict(ckpt, trainer.model, name)
    )
    opt_state = trainer.tx.init(params)
    log(f"imported reference torch checkpoint {path}")
    if not resume:
        return params, opt_state, None
    epoch = ckpt.get("epoch") if isinstance(ckpt, dict) else None
    if want_optimizer and isinstance(ckpt, dict) \
            and "optimizer_state_dict" in ckpt:
        try:
            mu, nu, count = import_reference_optimizer(
                ckpt, trainer.model, name
            )
            opt_state = trainer.load_adam_moments(
                opt_state,
                trainer.place_params(mu),
                trainer.place_params(nu),
                count,
            )
            log(f"imported Adam moments (step count {count})")
        except (ValueError, KeyError, IndexError, TypeError) as e:
            # resuming at epoch+1 (decayed LR) with zeroed moments would be
            # neither the reference's exact resume nor a clean fine-tune —
            # fall back to weights-only semantics (epoch 0, fresh optimizer)
            log(
                f"optimizer state not imported ({e}); falling back to "
                "weights-only import (epoch 0, fresh optimizer — "
                "torch_resume=false semantics)"
            )
            return params, opt_state, None
    return params, opt_state, epoch


def _metrics(cfg, num_classes):
    from stgx.utils.metrics import ConfusionMatrix, EditScore, F1Score

    return [
        F1Score(num_classes, tuple(cfg["processor"]["iou_threshold"])),
        EditScore(num_classes),
        ConfusionMatrix(num_classes),
    ]


def _write_curve(path, rows, header):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


# curve row layout produced by cmd_train's epoch loop
_CURVE_COLS = ["epoch", "train_ce", "train_mse", "val_ce", "val_mse",
               "top1_train", "top5_train", "top1_val", "top5_val",
               "time_train", "time_val"]


def _load_existing_curve(out_dir, start_epoch):
    """Rows with epoch < start_epoch from a previous run's
    train-validation-curve.csv (empty when starting fresh)."""
    path = os.path.join(out_dir, "train-validation-curve.csv")
    if start_epoch == 0 or not os.path.exists(path):
        return []
    rows = []
    with open(path, newline="") as f:
        for row in list(csv.reader(f))[1:]:
            if row and int(float(row[0])) < start_epoch:
                parsed = [int(float(row[0]))] + [float(v) for v in row[1:]]
                # rows written by an older stgx without the train top-k /
                # duration columns: pad with zeros so downstream column
                # indexing (_write_epoch_curves, _email_stats_table) keeps
                # working on a cross-version resume
                parsed += [0.0] * (len(_CURVE_COLS) - len(parsed))
                rows.append(parsed[: len(_CURVE_COLS)])
    return rows


def _write_epoch_curves(out_dir, curve):
    """The reference's two per-epoch curve CSVs (processor.py:757-773):
    accuracy-curve.csv (train/val top-k) + train-validation-curve.csv
    (train/val losses)."""
    _write_curve(
        os.path.join(out_dir, "train-validation-curve.csv"), curve, _CURVE_COLS
    )
    _write_curve(
        os.path.join(out_dir, "accuracy-curve.csv"),
        [[r[0], r[5], r[7], r[6], r[8]] for r in curve],
        ["epoch", "top1_train", "top1_val", "top5_train", "top5_val"],
    )


def _email_stats_table(job, curve):
    """``verbose > 1``: per-epoch stats table emailed newest-first, the
    stgx counterpart of the reference's shell printf + mail pipeline
    (processor.py:735-755)."""
    from stgx.utils.notify import send_mail

    header = (
        f"{'EPOCH':>6} {'LOSS_TRAIN':>11} {'LOSS_VAL':>9} {'TOP1_TRAIN':>11} "
        f"{'TOP5_TRAIN':>11} {'TOP1_VAL':>9} {'TOP5_VAL':>9} "
        f"{'TIME_TRAIN':>11} {'TIME_VAL':>9}"
    )
    lines = [header]
    for r in reversed(curve):  # newest first, like the reference's insert(0)
        lines.append(
            f"{r[0]:>6d} {r[1] + r[2]:>11.6f} {r[3] + r[4]:>9.6f} "
            f"{r[5]:>11.4f} {r[6]:>11.4f} {r[7]:>9.4f} {r[8]:>9.4f} "
            f"{r[9]:>11.6f} {r[10]:>9.6f}"
        )
    send_mail(
        job.get("email"),
        f"[{job.get('jobname', 'stgx')}]: status update",
        "\n".join(lines),
    )


def _demo_masks(trainer, params, dataset, demo_indices, out_dir, suffix="",
                write=True):
    """Per-trial (label, top1) CSV dumps (reference processor.py:308-322).

    The forward + fetch are collective over the trainer's mesh, so in a
    multi-process run EVERY process must call this; ``write=False`` skips
    only the host-side CSV write (non-primary processes)."""
    for i in demo_indices:
        if i >= len(dataset):
            continue
        x, y = dataset[i]
        xd, yd, mask = trainer._prepare(x, y)
        _, _, top1, *_ = trainer._eval_step(xd.shape)(params, xd, yd, mask)
        top1 = trainer._fetch(top1).reshape(-1)[: len(y)]
        if not write:
            continue
        _write_curve(
            os.path.join(out_dir, f"segmentation-{i}{suffix}.csv"),
            np.stack([np.asarray(y), top1]).T,
            ["label", "top1"],
        )


def cmd_train(cfg):
    import jax

    from stgx.utils.checkpoint import restore_checkpoint, save_checkpoint

    trainer, train_ds, val_ds, actions, ncls = _build_all(cfg)
    out_dir = cfg["processor"]["out"]
    os.makedirs(out_dir, exist_ok=True)
    log = _log_factory(cfg["job"])
    # multi-process (job.distributed): all processes run the same SPMD
    # steps and join the collective checkpoint saves, but host-side
    # artifacts (CSVs, demo masks, email) are written by process 0 only —
    # the processes share one output dir
    primary = jax.process_index() == 0

    x0, _ = train_ds[0]
    sample = (
        x0[None]
        if trainer.kind.startswith("frame")
        else np.zeros(
            (4, trainer.receptive_field, x0.shape[1], x0.shape[2]), np.float32
        )
    )
    params, opt_state = trainer.init(sample)
    params = maybe_graft_teacher(cfg, trainer, params, log)
    params, opt_state, torch_epoch = maybe_import_torch_checkpoint(
        cfg, trainer, params, opt_state, log
    )
    start_epoch = 0
    if torch_epoch is not None:
        # same resume rule as the reference (processor.py:582-587)
        start_epoch = int(torch_epoch) + 1
        log(f"resuming at epoch {start_epoch}")
        if start_epoch >= trainer.opt.epochs:
            log(
                f"WARNING: checkpoint epoch {torch_epoch} >= configured "
                f"epochs {trainer.opt.epochs}; no epochs will run. Set "
                "processor.torch_resume=false to fine-tune from epoch 0, "
                "or raise optimizer.epochs."
            )
    if cfg["processor"].get("checkpoint"):
        start_epoch, params, opt_state = restore_checkpoint(
            cfg["processor"]["checkpoint"], params, opt_state
        )
        start_epoch += 1
        log(f"resumed from epoch {start_epoch - 1}")

    # optional device profiling of the first trained epoch (SURVEY.md §5.1:
    # the reference only had wall clocks; this writes a real XLA trace
    # viewable in TensorBoard/Perfetto)
    profile_dir = cfg["job"].get("profile")
    verbose = cfg["job"].get("verbose", 0)
    # on resume, reload the pre-kill epoch rows so the per-epoch CSV
    # rewrites extend the curve instead of truncating it
    curve = _load_existing_curve(out_dir, start_epoch)
    t_start = time.time()
    for epoch in range(start_epoch, trainer.opt.epochs):
        if profile_dir and epoch == start_epoch:
            jax.profiler.start_trace(profile_dir)
        params, opt_state, tr = trainer.train_epoch(
            params, opt_state, train_ds, epoch, log=None
        )
        if profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()
            log(f"profile trace → {profile_dir}")
        metrics = _metrics(cfg, ncls)
        ev = trainer.evaluate(params, val_ds, metrics=metrics)
        curve.append(
            [epoch, tr["ce"], tr["mse"], ev["ce"], ev["mse"],
             tr["top1"], tr["top5"], ev["top1"], ev["top5"],
             tr["duration"], ev["duration"]]
        )
        log(
            f"[epoch {epoch}] train ce={tr['ce']:.3f} mse={tr['mse']:.3f} "
            f"top1={tr['top1']:.3f} ({tr['duration']:.1f}s) | "
            f"val ce={ev['ce']:.3f} "
            f"top1={ev['top1']:.3f} top5={ev['top5']:.3f} "
            f"({ev['duration']:.1f}s) | "
            + ", ".join(filter(None, (m.log() for m in metrics)))
        )
        if verbose > 0:
            # reference processor.py:725-733
            log(
                f"[epoch {epoch}]: train_time = {tr['duration']}, "
                f"val_time = {ev['duration']}"
            )
        if primary:
            for m in metrics:
                m.save(out_dir, suffix=f"-{epoch}")
        # per-epoch demo segmentation masks, overwritten like the
        # reference (processor.py:699-707, suffix=None inside the loop);
        # collective forward on every process, CSV write on the primary
        _demo_masks(
            trainer, params, val_ds, cfg["processor"].get("demo", []),
            out_dir, write=primary,
        )
        if primary:
            # per-epoch curve artifacts so a killed job still has them
            # (reference updates both CSVs every epoch, processor.py:757-773)
            _write_epoch_curves(out_dir, curve)
            if verbose > 1:
                _email_stats_table(cfg["job"], curve)
        if epoch in trainer.opt.checkpoint_indices:
            save_checkpoint(out_dir, epoch, params, opt_state)

    save_checkpoint(out_dir, trainer.opt.epochs - 1, params, opt_state, name="final")
    log(f"training done in {time.time() - t_start:.1f}s → {out_dir}")
    if not primary:
        return 0
    _write_epoch_curves(out_dir, curve)

    from stgx.utils.notify import backup_results, send_mail

    copied = backup_results(out_dir, cfg["processor"].get("backup"))
    if copied:
        log(f"backed up {len(copied)} artifacts → {cfg['processor']['backup']}")
    send_mail(
        cfg["job"].get("email"),
        f"stgx train complete: {cfg['processor']['model']}",
        f"epochs={trainer.opt.epochs} out={out_dir}\nlast: {curve[-1] if curve else '-'}",
    )
    return 0


def cmd_test(cfg):
    from stgx.utils.checkpoint import latest_epoch, restore_checkpoint

    trainer, train_ds, val_ds, actions, ncls = _build_all(cfg)
    out_dir = cfg["processor"]["out"]
    os.makedirs(out_dir, exist_ok=True)
    log = _log_factory(cfg["job"])

    x0, _ = val_ds[0]
    sample = (
        x0[None]
        if trainer.kind.startswith("frame")
        else np.zeros(
            (4, trainer.receptive_field, x0.shape[1], x0.shape[2]), np.float32
        )
    )
    params, opt_state = trainer.init(sample)
    params = maybe_graft_teacher(cfg, trainer, params, log)
    if cfg["processor"].get("torch_checkpoint"):
        params, opt_state, _ = maybe_import_torch_checkpoint(
            cfg, trainer, params, opt_state, log, want_optimizer=False
        )
    else:
        ckpt = cfg["processor"].get("checkpoint") or latest_epoch(out_dir)
        if ckpt:
            _, params, opt_state = restore_checkpoint(ckpt, params, opt_state)
            log(f"loaded checkpoint {ckpt}")

    import jax

    primary = jax.process_index() == 0  # see cmd_train's multi-process note
    metrics = _metrics(cfg, ncls)
    ev = trainer.evaluate(params, val_ds, metrics=metrics, log=None)
    if primary:
        for m in metrics:
            m.save(out_dir, suffix=None)
        _write_curve(
            os.path.join(out_dir, "accuracy.csv"),
            [[ev["top1"], ev["top5"], ev["ce"], ev["mse"]]],
            ["top1", "top5", "ce", "mse"],
        )
    _demo_masks(trainer, params, val_ds, cfg["processor"].get("demo", []),
                out_dir, write=primary)
    log(
        f"test: top1={ev['top1']:.4f} top5={ev['top5']:.4f} ce={ev['ce']:.3f} | "
        + ", ".join(filter(None, (m.log() for m in metrics)))
    )
    return 0


def cmd_benchmark(cfg):
    from stgx.bench.streaming import run_streaming_benchmark

    return run_streaming_benchmark(cfg)


def cmd_export(cfg):
    """Export the trained streaming cell to a StableHLO artifact
    (stgx/export.py) — checkpoint resolution identical to ``test``."""
    from stgx.export import save_streaming_cell
    from stgx.utils.checkpoint import latest_epoch, restore_checkpoint

    trainer, _, val_ds, _, _ = _build_all(cfg)
    out_dir = cfg["processor"]["out"]
    os.makedirs(out_dir, exist_ok=True)
    log = _log_factory(cfg["job"])

    x0, _ = val_ds[0]
    sample = (
        x0[None]
        if trainer.kind.startswith("frame")
        else np.zeros(
            (4, trainer.receptive_field, x0.shape[1], x0.shape[2]), np.float32
        )
    )
    params, opt_state = trainer.init(sample)
    params = maybe_graft_teacher(cfg, trainer, params, log)
    if cfg["processor"].get("torch_checkpoint"):
        params, _, _ = maybe_import_torch_checkpoint(
            cfg, trainer, params, opt_state, log, want_optimizer=False
        )
    else:
        ckpt = cfg["processor"].get("checkpoint") or latest_epoch(out_dir)
        if ckpt:
            _, params, _ = restore_checkpoint(ckpt, params, opt_state)
            log(f"loaded checkpoint {ckpt}")

    quantize = cfg["processor"].get("quantize")
    state_dtype = None
    calib_frames = None
    if quantize:
        import jax.numpy as jnp

        state_dtype = {
            None: None, "float32": jnp.float32,
            "bfloat16": jnp.bfloat16, "int8": jnp.int8,
        }[cfg["processor"].get("state_dtype")]
        # calibrate activation scales on real validation frames (the
        # reference's calibrate pass, processor.py:909-913)
        calib_frames = np.asarray(x0[:512], np.float32)
    path = cfg["processor"].get("export") or os.path.join(
        out_dir,
        "stream_cell_int8.stablehlo" if quantize else "stream_cell.stablehlo",
    )
    save_streaming_cell(
        path, trainer.model, cfg["processor"]["model"], params,
        window=trainer.receptive_field,
        quantize=quantize, calib_frames=calib_frames, state_dtype=state_dtype,
    )
    log(
        f"exported streaming cell → {path} "
        f"({os.path.getsize(path) / 1e6:.2f} MB artifact)"
    )
    return 0


def main(argv=None):
    from stgx.config import parse_args

    command, cfg = parse_args(argv)
    platform = cfg["job"].get("platform")
    if platform:
        # must run before the JAX backend initializes; the env pins
        # JAX_PLATFORMS=axon via sitecustomize, so override programmatically
        import jax

        jax.config.update("jax_platforms", platform)
    distributed = cfg["job"].get("distributed")
    if distributed:
        # multi-host pod slice: every host runs this same process; the mesh
        # then spans jax.devices() across hosts (reference's never-realized
        # DDP aspiration, SURVEY.md §2.bis). ``true`` auto-detects the
        # cluster (TPU pod / SLURM); a dict pins it explicitly, e.g.
        # {"coordinator_address": "host:port", "num_processes": 2,
        #  "process_id": 0} — process_id may also come from the
        # STGX_PROCESS_ID env var so one config file serves every process.
        import jax

        if isinstance(distributed, dict):
            kw = dict(distributed)
            if "process_id" not in kw and os.environ.get("STGX_PROCESS_ID"):
                kw["process_id"] = int(os.environ["STGX_PROCESS_ID"])
            jax.distributed.initialize(**kw)
        else:
            jax.distributed.initialize()
    try:
        return {
            "train": cmd_train,
            "test": cmd_test,
            "benchmark": cmd_benchmark,
            "export": cmd_export,
        }[command](cfg)
    except (Exception, SystemExit) as e:
        # failure notification — the reference relies on SLURM
        # --mail-type=FAIL, which fires on ANY nonzero exit
        # (vsc/pkummd_a100.slurm:12), so SystemExit aborts (e.g. the
        # benchmark's arch-mismatch check) mail too; stgx sends it from
        # the job itself so local/TPU-VM runs get it as well
        from stgx.utils.notify import send_mail

        if not (isinstance(e, SystemExit) and not e.code):
            send_mail(
                cfg["job"].get("email"),
                f"[{cfg['job'].get('jobname', 'stgx')}]: FAILED ({command})",
                f"{type(e).__name__}: {e}",
            )
        raise


if __name__ == "__main__":
    sys.exit(main())
