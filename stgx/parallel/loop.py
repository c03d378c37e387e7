"""Training/evaluation engine — the stgx counterpart of the reference
Processor (/root/reference/processor.py:188-982), rebuilt around jitted pure
steps:

* **unequal-length trials** become static-shape length buckets with frame
  masks (bounded recompilation) instead of ragged Python loops;
* **gradient accumulation** reproduces the reference's exact divisor
  semantics — every trial's loss is divided by ``batch_size`` except the
  ragged final group, divided by ``len(dataset) % batch_size``
  (processor.py:531-543) — with grads accumulated across trial steps and
  applied every ``batch_size`` trials (processor.py:557-564);
* **learning rate** decays as ``lr · decay^epoch`` (processor.py:260-269);
* **parallelism** comes from sharding the batch/frames over the ``(data,
  seq)`` mesh — XLA inserts gradient psums and conv halo exchanges; there is
  no separate DP/DDP code path;
* **window models** (st-gcn / aa-gcn family) train on per-frame
  receptive-field windows processed in ``segment``-sized chunks
  (WindowSegment semantics, SURVEY.md §2.5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stgx.parallel.segments import pad_to_bucket, sliding_windows
from stgx.utils.statistics import Statistics, StatisticsMultiStage

__all__ = ["Trainer", "OptimizerConfig", "MODEL_KIND", "MODEL_EPOCH_ARG"]

# how each model family consumes a trial and emits per-frame predictions
MODEL_KIND = {
    "st-gcn": "window",
    "aa-gcn": "window",
    "shift-gcn": "window",
    "shift-gcn++": "window",
    "shift-gcn++-teacher": "window",
    "co-st-gcn": "frame",
    "rt-st-gcn": "frame",
    "ms-tcn": "frame_ms",
    "ms-gcn": "window_ms",
}

# models whose forward takes the epoch index (the shift-gcn++ student's
# DY-SE expert gate anneals its softmax temperature 30 → 1 over 60 epochs,
# reference shiftgcn_plus.py:264-288,518-529)
MODEL_EPOCH_ARG = frozenset({"shift-gcn++"})


@dataclass
class OptimizerConfig:
    learning_rate: float = 5e-4
    learning_rate_decay: float = 1.0
    batch_size: int = 16
    epochs: int = 10
    seed: int = 0
    checkpoint_indices: tuple = ()


@dataclass
class Trainer:
    model: Any
    kind: str  # 'frame' | 'frame_ms' | 'window' | 'window_ms'
    loss: Any
    opt: OptimizerConfig
    mesh: Any = None
    receptive_field: int = 50  # window size W for window models
    segment: int | None = None  # window-chunk size (reference 'segment' knob)
    bucket: int = 128  # length-bucket granularity for frame models
    # stack up to this many same-bucket trials into one device step (frame
    # kinds). Each stacked trial keeps its own loss normalization and
    # accumulation divisor; note BatchNorm statistics then span the stack —
    # the reference's own file-mode batching behavior (processor.py:61-84)
    trial_batch: int = 1
    # 'bfloat16' runs the model forward/backward in bf16 (params are cast at
    # the step boundary and stay fp32 in the optimizer; norm statistics and
    # the loss compute in fp32 — see stgx/ops/norms.py). Halves activation
    # HBM traffic on TPU; gradients come back fp32 through the cast's VJP.
    compute_dtype: str | None = None
    # stage-per-device pipelining of MS-TCN refinement over the mesh's
    # `model` axis (stgx/parallel/pipeline.py). Requires kind='frame_ms',
    # a mesh whose `model` axis equals stages-1, and zero refinement
    # dropout (the pipelined schedule carries no per-stage rng).
    pipeline: bool = False
    # top-1/top-5 strategy object (reference STATISTICS registry,
    # utils/__init__.py:29-38); defaults by model kind when unset
    statistics: Any = None
    # pass the epoch index as the model's second positional arg (the
    # shift-gcn++ DY-SE temperature schedule; see MODEL_EPOCH_ARG)
    pass_epoch: bool = False
    _jit_cache: dict = field(default_factory=dict)

    def __post_init__(self):
        # rt_fused is a per-device Pallas op with no GSPMD partitioning
        # rule (stgx/ops/rt_fused.py): under a multi-device mesh it would
        # compile unpartitioned (crash or silent full replication). Force
        # the XLA chain instead — the guard rt_fused.py's header promises.
        if self.mesh is not None and self.mesh.devices.size > 1:
            from stgx.ops.rt_fused import rt_fused_enabled, set_rt_fused

            if rt_fused_enabled():
                import warnings

                warnings.warn(
                    "arch.rt_fused disabled: the fused RT-layer Pallas "
                    "kernel has no GSPMD partitioning rule; falling back "
                    "to the XLA gcn+window-sum chain on this "
                    f"{self.mesh.devices.size}-device mesh"
                )
                set_rt_fused(False)
        if self.statistics is None:
            self.statistics = (
                StatisticsMultiStage() if self.kind.endswith("_ms")
                else Statistics()
            )
        if self.pipeline:
            if self.kind != "frame_ms":
                raise ValueError("pipeline=True needs an ms-tcn-kind model")
            if self.mesh is None or self.mesh.shape.get("model", 1) < 2:
                raise ValueError(
                    "pipeline=True needs a mesh with a `model` axis sized "
                    "to the refinement-stage count"
                )
            if any(d != 0.0 for d in self.model.dropout):
                # the pipelined forward runs every stage (generator
                # included) without per-stage rng threading
                raise ValueError(
                    "pipelined ms-tcn needs zero dropout in every stage"
                )
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.opt.learning_rate
        )
        # donate grads + opt state + params: the update rewrites all three,
        # so XLA reuses their buffers instead of allocating fresh HBM
        self._apply_updates = jax.jit(
            lambda grads, opt_state, params: self._apply(grads, opt_state, params),
            donate_argnums=(0, 1, 2),
        )

    # -- setup ---------------------------------------------------------------

    def init(self, sample_x, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.opt.seed)
        x = jnp.asarray(sample_x)
        params = self.place_params(self.model.init(rng, x))
        opt_state = self.tx.init(params)
        return params, opt_state

    def place_params(self, params):
        """Lay params out on the mesh (TP channel sharding when the `model`
        axis is sized, replicated otherwise). Also used to re-place params
        loaded from external sources (e.g. imported torch checkpoints) so
        they keep the layout the optimizer state was built for."""
        params = jax.tree.map(jnp.asarray, params)
        if self.mesh is None:
            return params
        if self.pipeline:
            # the `model` axis is the STAGE axis here; stage-sharding happens
            # inside pipeline_apply's shard_map. Keeping leaves replicated
            # makes that reshard a local slice each step — TP channel
            # sharding would force a per-step all-to-all instead.
            return jax.device_put(params, NamedSharding(self.mesh, P()))
        if self.mesh.shape.get("model", 1) > 1:
            # tensor parallelism: output channels sharded over `model`;
            # optimizer state built from these inherits the layout
            from stgx.parallel.tp import shard_params_tp

            return shard_params_tp(params, self.mesh)
        return jax.device_put(params, NamedSharding(self.mesh, P()))

    def _apply(self, grads, opt_state, params):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def load_adam_moments(self, opt_state, mu, nu, count: int):
        """Replace the Adam first/second-moment trees and step count inside
        an existing opt state (used when resuming from an imported reference
        checkpoint — processor.py:579,582-587 semantics). ``mu``/``nu`` must
        already share the params' structure and placement."""
        count = jnp.asarray(count, jnp.int32)
        hits = []

        def walk(s):
            if isinstance(s, optax.ScaleByAdamState):
                hits.append(True)
                return s._replace(count=count, mu=mu, nu=nu)
            if isinstance(s, tuple) and hasattr(s, "_fields"):
                return type(s)(*[walk(v) for v in s])
            if isinstance(s, tuple):
                return tuple(walk(v) for v in s)
            return s

        new = walk(opt_state)
        if not hits:
            raise ValueError("no ScaleByAdamState found in the opt state")
        return new

    def set_lr(self, opt_state, epoch: int):
        """``lr · decay^epoch`` (reference processor.py:265)."""
        rate = self.opt.learning_rate * (self.opt.learning_rate_decay**epoch)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(rate)
        return opt_state

    # -- per-trial forward/grad steps (jitted per bucketed shape) -------------

    def _cast_compute(self, tree):
        if self.compute_dtype is None:
            return tree
        dt = jnp.dtype(self.compute_dtype)
        return jax.tree.map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            tree,
        )

    def _shard(self, x):
        if self.mesh is None:
            return x
        axes = [None] * x.ndim
        if x.shape[0] % self.mesh.shape["data"] == 0:
            axes[0] = "data"
        if x.ndim > 1 and x.shape[1] % self.mesh.shape["seq"] == 0:
            axes[1] = "seq"
        return jax.device_put(x, NamedSharding(self.mesh, P(*axes)))

    @staticmethod
    def _fetch(arr):
        """Bring a step output to host. When the mesh spans multiple
        processes (``jax.distributed``), sharded outputs (per-frame top-1
        streams, per-trial loss vectors) are not fully addressable locally —
        allgather them so every process sees the identical global value
        (the DDP metric path the reference stubbed out,
        /root/reference/utils/metrics/metric.py:39-40)."""
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
        return np.asarray(arr)

    def _frame_outputs(self, params, x, mask, train, rngs=None, epoch=None):
        """Per-frame predictions for loss: ((N, L, C) or (S, N, L, C), aux).

        ``aux`` is an auxiliary scalar loss some models emit alongside their
        logits (the shift-gcn++ distillation wrapper); zero otherwise.
        ``epoch`` feeds epoch-conditioned models (``pass_epoch``); ``None``
        means post-anneal (τ = 1) — the eval-time setting, expressed as
        epoch=∞ so it stays past the anneal horizon regardless of the
        model's schedule length.
        """
        eargs = ()
        if self.pass_epoch:
            eargs = (jnp.asarray(jnp.inf if epoch is None else epoch,
                                 jnp.float32),)
        if self.kind in ("frame", "frame_ms"):
            if self.pipeline:
                from stgx.parallel.pipeline import mstcn_apply_pipelined

                # dropout is 0 (enforced in __post_init__), so the
                # pipelined forward equals the train forward exactly
                out = mstcn_apply_pipelined(self.model, params, x, self.mesh)
            else:
                out = self.model.apply(
                    params, x, *eargs, train=train, mask=mask, rngs=rngs
                )
        else:
            # window models: x is already a window tensor (B, W, V, C) whose
            # batch dim is time; predictions form the series (1, B, C).
            # A fully-padded window is masked out of batch-norm statistics.
            wmask = (
                None
                if mask is None
                else jnp.broadcast_to(mask[:, None], (x.shape[0], x.shape[1]))
            )
            out = self.model.apply(
                params, x, *eargs, train=train, mask=wmask, rngs=rngs
            )
        aux = 0.0
        if isinstance(out, tuple):
            out, aux = out
        if self.kind == "window":
            out = out[None]
        return out, aux

    def _grad_step_batched(self, shape_key):
        """Grad step over a stack of independent same-length trials; each row
        keeps its own per-trial loss mean and accumulation divisor."""
        if ("gradb", shape_key) in self._jit_cache:
            return self._jit_cache[("gradb", shape_key)]

        def step(params, x, y, mask, divisors, rng, epoch):
            def loss_fn(p):
                out, _ = self._frame_outputs(
                    self._cast_compute(p), self._cast_compute(x), mask,
                    train=True, rngs={"dropout": rng}, epoch=epoch,
                )
                out = out.astype(jnp.float32)
                ce_v, mse_v = self.loss(out, y, mask, per_sample=True)
                scaled = jnp.sum((ce_v + mse_v) / divisors)
                # train-time top-k counts from the same forward pass, like
                # the reference (processor.py:389-392,687-694); free on the
                # MXU path (argmax + compare, no extra HBM pass)
                _, _, c1, c5, tot = self.statistics(
                    jax.lax.stop_gradient(out), y, mask
                )
                return scaled, (jnp.sum(ce_v), jnp.sum(mse_v), c1, c5, tot)

            (_, (ce, mse, c1, c5, tot)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return grads, ce, mse, c1, c5, tot

        fn = jax.jit(step)
        self._jit_cache[("gradb", shape_key)] = fn
        return fn

    def _grad_step(self, shape_key):
        if ("grad", shape_key) in self._jit_cache:
            return self._jit_cache[("grad", shape_key)]

        def step(params, x, y, mask, divisor, rng, epoch):
            def loss_fn(p):
                rngs = {"dropout": rng}
                out, aux = self._frame_outputs(
                    self._cast_compute(p), self._cast_compute(x), mask,
                    train=True, rngs=rngs, epoch=epoch,
                )
                out = out.astype(jnp.float32)
                lmask = (
                    mask[None]
                    if mask is not None and self.kind.startswith("window")
                    else mask
                )
                ly = y[None] if self.kind.startswith("window") else y
                ce, mse = self.loss(out, ly, lmask)
                # train top-k from the training forward, as the reference
                # does (processor.py:389-392,687-694)
                _, _, c1, c5, tot = self.statistics(
                    jax.lax.stop_gradient(out), ly, lmask
                )
                return (ce + mse + aux) / divisor, (ce, mse, c1, c5, tot)

            (scaled, (ce, mse, c1, c5, tot)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return grads, ce, mse, c1, c5, tot

        fn = jax.jit(step)
        self._jit_cache[("grad", shape_key)] = fn
        return fn

    def _eval_step_batched(self, shape_key):
        """Eval over a stack of same-length trials: per-trial losses plus
        aggregate top-k counts. Like the train-side batching, BatchNorm
        statistics span the stack — the reference's own file-mode
        DataLoader-batched behavior (processor.py:61-84); with LayerNorm
        the stacked eval equals the per-trial eval exactly."""
        if ("evalb", shape_key) in self._jit_cache:
            return self._jit_cache[("evalb", shape_key)]

        def step(params, x, y, mask):
            out, _ = self._frame_outputs(
                self._cast_compute(params), self._cast_compute(x), mask,
                train=False,
            )
            out = out.astype(jnp.float32)
            ce_v, mse_v = self.loss(out, y, mask, per_sample=True)
            top1, _, c1, c5, tot = self.statistics(out, y, mask)
            return ce_v, mse_v, top1, c1, c5, tot

        fn = jax.jit(step)
        self._jit_cache[("evalb", shape_key)] = fn
        return fn

    def _eval_step(self, shape_key):
        if ("eval", shape_key) in self._jit_cache:
            return self._jit_cache[("eval", shape_key)]

        def step(params, x, y, mask):
            out, _ = self._frame_outputs(
                self._cast_compute(params), self._cast_compute(x), mask,
                train=False,
            )
            out = out.astype(jnp.float32)
            lmask = (
                mask[None]
                if mask is not None and self.kind.startswith("window")
                else mask
            )
            ly = y[None] if self.kind.startswith("window") else y
            ce, mse = self.loss(out, ly, lmask)
            top1, _, c1, c5, tot = self.statistics(out, ly, lmask)
            return ce, mse, top1, c1, c5, tot

        fn = jax.jit(step)
        self._jit_cache[("eval", shape_key)] = fn
        return fn

    # -- trial preparation -----------------------------------------------------

    def _prepare(self, x, y):
        """Bucket-pad one trial and lay it out for the model kind.

        The frame mask is always materialized, even for exactly-full
        buckets: mask elision (None for full buckets) measured a 0.4%
        step-time difference (XLA fuses the mask math for free,
        stgx/bench/ablate.py no_mask variant) while doubling the number of
        traced step variants per bucket — not worth the tunnel's compile
        cost. The jitted steps still accept ``mask=None`` (the ungated
        graph) for direct library use."""
        xp, yp, mask = pad_to_bucket(x, y, self.bucket)
        if self.kind in ("frame", "frame_ms"):
            return (
                self._shard(jnp.asarray(xp[None])),
                jnp.asarray(yp[None]),
                jnp.asarray(mask[None]),
            )
        windows = sliding_windows(jnp.asarray(xp[None]), self.receptive_field)[0]
        return self._shard(windows), jnp.asarray(yp), jnp.asarray(mask)

    def _window_chunks(self, xd, yd, mask):
        """Split a trial's window tensor into ``segment``-sized chunks (the
        reference's memory-bounding knob, WindowSegment.get_segment,
        segment_generator.py:132-145). Bucketing guarantees divisibility when
        ``segment`` divides ``bucket``."""
        if self.segment is None or not self.kind.startswith("window"):
            return [(xd, yd, mask)]
        seg = self.segment
        b = xd.shape[0]
        if b <= seg:
            return [(xd, yd, mask)]
        n_chunks = -(-b // seg)
        chunks = []
        for i in range(n_chunks):
            sl = slice(i * seg, min((i + 1) * seg, b))
            chunks.append((xd[sl], yd[sl], None if mask is None else mask[sl]))
        return chunks

    # -- epoch loops -----------------------------------------------------------

    def _batched_epoch(self, params, opt_state, dataset, rng, log, epoch=0):
        """Frame-kind epoch with same-bucket trials stacked per device step."""
        n = len(dataset)
        bs = self.opt.batch_size
        ragged = n % bs
        accum = None
        ce_sum = mse_sum = 0.0
        c1 = c5 = tot = 0
        t0 = time.time()

        i = 0
        since_step = 0
        while i < n:
            # stack consecutive same-bucket, same-divisor-region trials,
            # never across an optimizer-step boundary
            group = []
            first_len = None
            while (
                i < n
                and len(group) < self.trial_batch
                and since_step + len(group) < bs
            ):
                x, y = dataset[i]
                xp, yp, mask = pad_to_bucket(x, y, self.bucket)
                if first_len is None:
                    first_len = xp.shape[0]
                elif xp.shape[0] != first_len:
                    break
                in_ragged = ragged != 0 and i >= n - ragged
                if group and group[0][3] != in_ragged:
                    break
                group.append((xp, yp, mask, in_ragged))
                i += 1

            xb = self._shard(jnp.asarray(np.stack([g[0] for g in group])))
            yb = jnp.asarray(np.stack([g[1] for g in group]))
            mb = jnp.asarray(np.stack([g[2] for g in group]))
            div = jnp.asarray(
                [float(ragged if g[3] else bs) for g in group], jnp.float32
            )
            rng, sub = jax.random.split(rng)
            grads, ce, mse, ic1, ic5, itot = self._grad_step_batched(xb.shape)(
                params, xb, yb, mb, div, sub,
                jnp.asarray(epoch, jnp.float32),
            )
            accum = (
                grads if accum is None else jax.tree.map(jnp.add, accum, grads)
            )
            ce_sum += float(ce)
            mse_sum += float(mse)
            c1 += int(ic1)
            c5 += int(ic5)
            tot += int(itot)
            since_step += len(group)
            if log:
                log(f"[trials ..{i - 1}]: ce = {float(ce):.4f}")

            if since_step >= bs or i == n:
                params, opt_state = self._apply_updates(accum, opt_state, params)
                accum = None
                since_step = 0

        return params, opt_state, {
            "ce": ce_sum,
            "mse": mse_sum,
            "top1": c1 / max(tot, 1),
            "top5": c5 / max(tot, 1),
            "duration": time.time() - t0,
        }

    def train_epoch(self, params, opt_state, dataset, epoch: int, rng=None,
                    log: Callable[[str], None] | None = None):
        """One epoch with trial-level gradient accumulation."""
        opt_state = self.set_lr(opt_state, epoch)
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.opt.seed + 1000 + epoch
        )
        if self.trial_batch > 1 and self.kind in ("frame", "frame_ms"):
            return self._batched_epoch(
                params, opt_state, dataset, rng, log, epoch
            )
        n = len(dataset)
        bs = self.opt.batch_size
        ragged = n % bs
        accum = None
        ce_sum = mse_sum = 0.0
        c1 = c5 = tot = 0
        t0 = time.time()

        for i in range(n):
            x, y = dataset[i]
            xd, yd, mask = self._prepare(x, y)
            divisor = float(
                bs if (ragged == 0 or i < n - ragged) else ragged
            )
            chunks = self._window_chunks(xd, yd, mask)
            trial_ce = trial_mse = 0.0
            for cx, cy, cm in chunks:
                rng, sub = jax.random.split(rng)
                # per-chunk loss divided by the chunk count, reproducing the
                # reference's ce/num_subsegments (processor.py:392,532-543)
                grads, ce, mse, ic1, ic5, itot = self._grad_step(cx.shape)(
                    params, cx, cy, cm, divisor * len(chunks), sub,
                    jnp.asarray(epoch, jnp.float32),
                )
                accum = (
                    grads
                    if accum is None
                    else jax.tree.map(jnp.add, accum, grads)
                )
                trial_ce += float(ce) / len(chunks)
                trial_mse += float(mse) / len(chunks)
                c1 += int(ic1)
                c5 += int(ic5)
                tot += int(itot)
            ce_sum += trial_ce
            mse_sum += trial_mse
            if log:
                log(f"[trial {i}]: loss = {trial_ce + trial_mse:.4f}")

            if (i + 1) % bs == 0 or (i + 1) == n:
                params, opt_state = self._apply_updates(accum, opt_state, params)
                accum = None

        return params, opt_state, {
            "ce": ce_sum,
            "mse": mse_sum,
            "top1": c1 / max(tot, 1),
            "top5": c5 / max(tot, 1),
            "duration": time.time() - t0,
        }

    def evaluate(self, params, dataset, metrics=(), num_samples=None,
                 log: Callable[[str], None] | None = None):
        """Full-dataset eval: losses, top1/top5, segmental metrics per trial."""
        n_visit = len(dataset) if num_samples is None else min(
            len(dataset), num_samples
        )
        for m in metrics:
            m.init_metric(n_visit)
        if self.trial_batch > 1 and self.kind in ("frame", "frame_ms"):
            return self._evaluate_batched(
                params, dataset, metrics, n_visit, log
            )
        c1 = c5 = tot = 0
        ce_sum = mse_sum = 0.0
        t0 = time.time()
        for i in range(n_visit):
            x, y = dataset[i]
            xd, yd, mask = self._prepare(x, y)
            chunks = self._window_chunks(xd, yd, mask)
            top1_parts = []
            trial_ce = trial_mse = 0.0
            for cx, cy, cm in chunks:
                ce, mse, top1, ic1, ic5, itot = self._eval_step(cx.shape)(
                    params, cx, cy, cm
                )
                trial_ce += float(ce) / len(chunks)
                trial_mse += float(mse) / len(chunks)
                c1 += int(ic1)
                c5 += int(ic5)
                tot += int(itot)
                top1_parts.append(self._fetch(top1).reshape(-1))
            ce_sum += trial_ce
            mse_sum += trial_mse
            valid = np.concatenate(top1_parts)[: len(y)]
            for m in metrics:
                m(np.asarray(y), valid)
            if log:
                log(f"[trial {i}]: loss = {trial_ce + trial_mse:.4f}")
        for m in metrics:
            m.reduce()
        return {
            "top1": c1 / max(tot, 1),
            "top5": c5 / max(tot, 1),
            "ce": ce_sum,
            "mse": mse_sum,
            "duration": time.time() - t0,
        }

    def _evaluate_batched(self, params, dataset, metrics, n_visit, log):
        """Frame-kind eval with same-bucket trials stacked per device step
        (the eval-side counterpart of _batched_epoch)."""
        c1 = c5 = tot = 0
        ce_sum = mse_sum = 0.0
        t0 = time.time()
        i = 0
        while i < n_visit:
            group, labels = [], []
            first_len = None
            while i < n_visit and len(group) < self.trial_batch:
                x, y = dataset[i]
                xp, yp, mask = pad_to_bucket(x, y, self.bucket)
                if first_len is None:
                    first_len = xp.shape[0]
                elif xp.shape[0] != first_len:
                    break
                group.append((xp, yp, mask))
                labels.append(y)
                i += 1
            xb = self._shard(jnp.asarray(np.stack([g[0] for g in group])))
            yb = jnp.asarray(np.stack([g[1] for g in group]))
            mb = jnp.asarray(np.stack([g[2] for g in group]))
            ce_v, mse_v, top1, ic1, ic5, itot = self._eval_step_batched(
                xb.shape
            )(params, xb, yb, mb)
            ce_v, mse_v = self._fetch(ce_v), self._fetch(mse_v)
            top1 = self._fetch(top1)
            c1 += int(ic1)
            c5 += int(ic5)
            tot += int(itot)
            ce_sum += float(ce_v.sum())
            mse_sum += float(mse_v.sum())
            for j, y in enumerate(labels):
                for m in metrics:
                    m(np.asarray(y), top1[j][: len(y)])
                if log:
                    log(
                        f"[trial {i - len(labels) + j}]: "
                        f"loss = {float(ce_v[j] + mse_v[j]):.4f}"
                    )
        for m in metrics:
            m.reduce()
        return {
            "top1": c1 / max(tot, 1),
            "top5": c5 / max(tot, 1),
            "ce": ce_sum,
            "mse": mse_sum,
            "duration": time.time() - t0,
        }
