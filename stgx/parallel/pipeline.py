"""Pipeline parallelism: stage-per-device MS-TCN/MS-GCN refinement.

The reference runs its multi-stage refinement sequentially on one device
(/root/reference/models/msgcn/msgcn.py:55-63); SURVEY.md §2.bis lists
stage-per-device pipelining as the optional PP strategy. Here it is a
GPipe-style schedule over the ``model`` mesh axis:

* the S identical refinement stages' parameters are stacked on a leading
  stage axis and sharded one-stage-per-device;
* the batch is split into M microbatches; on tick ``t`` device ``s``
  processes microbatch ``t - s`` (when in range) and ``ppermute``s its
  output one hop down the ring — activations ride ICI, never the host;
* every stage's outputs are collected (the MS-TCN loss consumes all stages)
  and gathered along the stage axis on exit.

The schedule runs ``S + M - 1`` ticks, so the bubble fraction is
``(S-1)/(S+M-1)``; reverse-mode AD differentiates straight through the
``scan``/``ppermute`` schedule, so the same code path trains. Equality with
the sequential model (forward and gradients) is pinned in
``tests/test_pipeline.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax ≥ 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw["check_vma"] = kw.pop("check_rep")
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = [
    "stack_stage_params",
    "pipeline_apply",
    "mstcn_apply_pipelined",
    "msgcn_refine_pipelined",
]


def stack_stage_params(params: dict, names: list[str]):
    """Stack per-stage parameter subtrees on a new leading stage axis.

    All named stages must share one shape (the canonical configs' uniform
    filters/layers/kernel refinement plan).
    """
    stages = [params[n] for n in names]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def pipeline_apply(
    stage_fn,
    stacked_params,
    y,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: int | None = None,
):
    """Run ``stage_fn`` S times in a stage-per-device pipeline.

    Args:
        stage_fn: ``(one_stage_params, y) -> y'`` — one refinement stage,
            including the inter-stage adapter (e.g. softmax) on its input.
        stacked_params: pytree with leading stage axis of size S == the
            ``axis`` mesh dimension.
        y: ``(N, ...)`` input to the first stage (the generator's output).
        num_microbatches: M; defaults to min(N, S). Must divide N.

    Returns:
        ``(S, N, ...)`` — every stage's output, in stage order.
    """
    S = mesh.shape[axis]
    s_leaf = jax.tree.leaves(stacked_params)[0].shape[0]
    if s_leaf != S:
        raise ValueError(
            f"stage count {s_leaf} != mesh axis {axis!r} size {S}; "
            "size the mesh so one device holds one refinement stage"
        )
    N = y.shape[0]
    if num_microbatches is not None:
        M = num_microbatches
    elif N % S == 0:
        M = S
    else:
        # largest microbatch count that divides N while staying ≤ S keeps
        # any batch size valid (gcd falls back to 1 = no microbatching)
        M = math.gcd(N, S)
    if N % M != 0:
        raise ValueError(f"batch {N} not divisible into {M} microbatches")
    y_mb = y.reshape(M, N // M, *y.shape[1:])
    ticks = S + M - 1
    perm = [(i, i + 1) for i in range(S - 1)]

    # dp × pp composition: shard the microbatch-sample dim over `data` so
    # each data row refines its own slice instead of recomputing the whole
    # batch (the replication cost flagged in round-1 review); falls back to
    # replication when the microbatch doesn't divide over the data axis
    dp = mesh.shape.get("data", 1)
    shard_data = dp > 1 and (N // M) % dp == 0
    in_spec_y = P(None, "data") if shard_data else P()
    out_spec = P(axis, None, "data") if shard_data else P(axis)

    def run(p_local, y_all):
        # p_local leaves are (1, ...) — this device's single stage
        p = jax.tree.map(lambda a: jnp.squeeze(a, 0), p_local)
        idx = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(y_all[0])
        out_buf = jnp.zeros((M,) + y_all.shape[1:], y_all.dtype)

        def tick(carry, t):
            state, outputs = carry
            inject = y_all[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(idx == 0, inject, state)
            outp = stage_fn(p, inp)
            m = t - idx  # microbatch index live on this device at tick t
            valid = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, mc, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, outp, cur), mc, 0
            )
            state = jax.lax.ppermute(outp, axis, perm)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (zero, out_buf), jnp.arange(ticks)
        )
        return outputs[None]  # (1, M, mb, ...) per device

    outs = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), in_spec_y),
        out_specs=out_spec,
        check_rep=False,
    )(stacked_params, y_mb)
    return outs.reshape(outs.shape[0], N, *y.shape[1:])


def _uniform_refine(model, lo: int):
    """Assert the refinement plan is stage-uniform and return its config."""
    kern = getattr(model, "refine_kernel", None) or model.kernel
    drop = getattr(model, "refine_dropout", None) or model.dropout
    plans = {
        (model.filters[s], model.layers[s], kern[s], drop[s])
        for s in range(lo, model.stages)
    }
    if len(plans) != 1:
        raise ValueError(
            "pipeline parallelism needs a stage-uniform refinement plan; "
            f"got {sorted(plans)}"
        )
    return next(iter(plans))


def mstcn_apply_pipelined(
    model,
    params,
    x,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: int | None = None,
):
    """MsTcn.apply with the S-1 refinement stages pipelined over ``axis``.

    Matches ``model.apply(params, x)`` (eval path) exactly; differentiable,
    so it also serves as the training forward when dropout is 0.
    """
    from stgx.models.mstcn import SingleStage, output_adapter

    prob = output_adapter(model.refine)
    out = output_adapter(model.output_type)
    p = params["params"]

    # train=True keeps arch.remat active under AD; only safe (rng-free)
    # when every stage's dropout is 0 — the Trainer enforces that for
    # pipelined training, and for eval usage train=False is equivalent
    train = all(d == 0.0 for d in model.dropout)
    gen = SingleStage(
        out_channels=model.num_classes,
        num_filters=model.filters[0],
        num_layers=model.layers[0],
        kernel=model.kernel[0],
        dropout=model.dropout[0],
        remat=model.remat,
    )
    y = gen.apply({"params": p["SingleStage_0"]}, x, train=train)
    y = jnp.mean(y, axis=2)  # (N, L, C)

    filt, layers, kern, drop = _uniform_refine(model, 1)
    refine = SingleStage(
        out_channels=model.num_classes,
        num_filters=filt,
        num_layers=layers,
        kernel=kern,
        dropout=drop,
        remat=model.remat,
    )

    def stage_fn(sp, yin):
        return refine.apply(
            {"params": sp}, prob(yin)[:, :, None, :], train=train
        )[:, :, 0, :]

    stacked = stack_stage_params(
        p, [f"SingleStage_{s}" for s in range(1, model.stages)]
    )
    refined = pipeline_apply(
        stage_fn, stacked, y, mesh, axis, num_microbatches
    )  # (stages-1, N, L, C)
    return jnp.concatenate([out(y)[None], out(refined)], axis=0)


def msgcn_refine_pipelined(
    model,
    params,
    gen_logits,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: int | None = None,
):
    """MS-GCN refinement over pipelined stages.

    ``gen_logits``: the ST-GCN generator's per-window logits re-laid as a
    ``(1, T, classes)`` series (msgcn.py:70-71 equivalent). Returns
    ``(stages+1, 1, T, classes)`` matching ``MsGcn.__call__``.
    """
    from stgx.models.mstcn import SingleStage, output_adapter

    prob = output_adapter(model.refine)
    out = output_adapter(model.output_type)
    p = params["params"]

    filt, layers, kern, drop = _uniform_refine(model, 0)
    refine = SingleStage(
        out_channels=model.num_classes,
        num_filters=filt,
        num_layers=layers,
        kernel=kern,
        dropout=drop,
    )

    def stage_fn(sp, yin):
        return refine.apply({"params": sp}, prob(yin)[:, :, None, :])[:, :, 0, :]

    stacked = stack_stage_params(
        p, [f"SingleStage_{s}" for s in range(model.stages)]
    )
    refined = pipeline_apply(
        stage_fn, stacked, gen_logits, mesh, axis, num_microbatches
    )
    return jnp.concatenate([out(gen_logits)[None], out(refined)], axis=0)
