"""Analytic MACs / parameter-memory counters for the model families.

Reproduces the complexity metrics the reference publishes per model
(README.md:263-272: MACs, memory words, latency). Per-frame MACs for the
continual models; per-window for the window classifiers.
"""

from __future__ import annotations

__all__ = [
    "rt_stgcn_macs_per_frame",
    "costgcn_macs_per_frame",
    "stgcn_macs_per_window",
    "rt_stgcn_train_hbm_bytes_per_frame",
    "stgcn_train_hbm_bytes_per_window",
    "param_words",
]


def rt_stgcn_macs_per_frame(
    num_joints: int = 25,
    partitions: int = 3,
    in_feat: int = 3,
    num_classes: int = 52,
    in_ch=(64, 64, 64, 64, 128, 128, 128, 256, 256),
    out_ch=(64, 64, 64, 128, 128, 128, 256, 256, 256),
    residual=(1,) * 9,
) -> int:
    """MACs to advance the streaming RT-ST-GCN by one frame."""
    v, p = num_joints, partitions
    macs = v * in_feat * in_ch[0]  # fcn_in
    for cin, cout, res in zip(in_ch, out_ch, residual):
        macs += v * cin * cout * p  # partition-wise 1×1 conv
        macs += p * v * v * cout  # adjacency aggregation
        if res and cin != cout:
            macs += v * cin * cout  # residual 1×1
    macs += out_ch[-1] * num_classes  # fcn_out (after joint pool)
    return macs


def costgcn_macs_per_frame(
    num_joints: int = 25,
    partitions: int = 3,
    in_feat: int = 3,
    num_classes: int = 52,
    kernel: int = 9,
    in_ch=(64, 64, 64, 64, 128, 128, 128, 256, 256),
    out_ch=(64, 64, 64, 128, 128, 128, 256, 256, 256),
    residual=(1,) * 9,
) -> int:
    """MACs to advance the continual CoST-GCN by one frame: RT-ST-GCN's
    per-frame cost plus a full Γ-tap temporal conv over each layer's FIFO
    (the Γ-fold difference behind the reference's 78.6 M vs 20.1 M table,
    /root/reference/README.md:269-271; dilation stretches the FIFO but not
    the MAC count)."""
    v, p = num_joints, partitions
    macs = v * in_feat * in_ch[0]  # fcn_in
    for cin, cout, res in zip(in_ch, out_ch, residual):
        macs += v * cin * cout * p  # partition-wise 1×1 conv
        macs += p * v * v * cout  # adjacency aggregation
        macs += v * cout * cout * kernel  # Γ-tap temporal conv per frame
        if res and cin != cout:
            macs += v * cin * cout  # residual 1×1
    macs += out_ch[-1] * num_classes  # per-frame head
    return macs


def stgcn_macs_per_window(
    window: int = 50,
    num_joints: int = 25,
    partitions: int = 3,
    in_feat: int = 3,
    num_classes: int = 52,
    kernel: int = 9,
    in_ch=(64, 64, 64, 64, 128, 128, 128, 256, 256),
    out_ch=(64, 64, 64, 128, 128, 128, 256, 256, 256),
    stride=(1, 1, 1, 2, 1, 1, 2, 1, 1),
    residual=(1,) * 9,
) -> int:
    """MACs for one ST-GCN window classification."""
    v, p = num_joints, partitions
    l = window
    macs = l * v * in_feat * in_ch[0]
    for cin, cout, s, res in zip(in_ch, out_ch, stride, residual):
        macs += l * v * cin * cout * p  # gcn 1×1
        macs += l * p * v * v * cout  # adjacency
        lo = -(-l // s)
        macs += lo * v * cout * cout * kernel  # temporal conv
        if res and (cin != cout or s != 1):
            macs += lo * v * cin * cout
        l = lo
    macs += out_ch[-1] * num_classes
    return macs


def rt_stgcn_train_hbm_bytes_per_frame(
    num_joints: int = 25,
    partitions: int = 3,
    in_feat: int = 3,
    in_ch=(64, 64, 64, 64, 128, 128, 128, 256, 256),
    out_ch=(64, 64, 64, 128, 128, 128, 256, 256, 256),
    dtype_bytes: int = 2,
    bwd_factor: float = 2.0,
) -> float:
    """Minimal HBM bytes per frame for the fwd+bwd RT-ST-GCN train step —
    the *memory* speed-of-light that bounds this model on TPU (its matmuls
    are small-channel, so the MXU roofline is far above the HBM one).

    Perfect-per-op-fusion model, per layer: aggregate reads x and writes
    the P-expanded intermediate; the gcn matmul reads it back and writes y;
    the causal window-sum is read + write; batch-norm is one stats read
    plus a normalize read + write (ReLU and the residual add fuse into it,
    one extra read of x for the residual). Backward counted as
    ``bwd_factor`` × forward (re-read saved activations, write activation
    grads, weight-grad reductions). Parameter/optimizer traffic is per-step
    (not per-frame) and excluded.
    """
    v, p = num_joints, partitions
    bytes_fwd = v * (in_feat + in_ch[0])  # fcn_in read + write
    for cin, cout in zip(in_ch, out_ch):
        a_in, a_out = v * cin, v * cout
        bytes_fwd += (
            2 * a_in        # aggregate read x + residual read
            + 2 * p * a_in  # P-expanded intermediate write + read
            + a_out         # matmul write
            + 2 * a_out     # window-sum read + write
            + 3 * a_out     # BN stats read + normalize read + write
        )
    bytes_fwd += out_ch[-1]  # head read (post joint-pool)
    return bytes_fwd * dtype_bytes * (1.0 + bwd_factor)


def stgcn_train_hbm_bytes_per_window(
    window: int = 50,
    num_joints: int = 25,
    partitions: int = 3,
    in_feat: int = 3,
    kernel: int = 9,
    in_ch=(64, 64, 64, 64, 128, 128, 128, 256, 256),
    out_ch=(64, 64, 64, 128, 128, 128, 256, 256, 256),
    stride=(1, 1, 1, 2, 1, 1, 2, 1, 1),
    residual=(1,) * 9,
    dtype_bytes: int = 2,
    bwd_factor: float = 2.0,
) -> float:
    """Minimal HBM bytes to train on one ST-GCN window — the window-family
    analog of `rt_stgcn_train_hbm_bytes_per_frame`, for the combined
    roofline ``max(FLOPs/MXU, bytes/HBM)`` the round-4 audit showed is the
    honest bound (the window models are NOT purely compute-bound: the same
    per-layer P-expanded aggregation intermediate dominates their traffic,
    docs/PERF.md).

    Perfect-per-op-fusion accounting per layer (reference layer chain
    /root/reference/models/stgcn/stgcn.py:80-97): aggregate reads x, writes
    the P-expanded intermediate; the gcn matmul reads it back, writes the
    pre-TCN activation (length L); BN = stats read + normalize read/write;
    the Γ-tap temporal conv reads the padded activation once (taps reuse in
    VMEM) and writes L/s frames; second BN likewise; the residual is one
    extra read of x (plus a write at shape changes). Backward counted as
    ``bwd_factor`` × forward; parameter/optimizer traffic is per-step and
    excluded.
    """
    v, p = num_joints, partitions
    l = window
    words = l * v * (in_feat + in_ch[0])  # fcn_in read + write
    for cin, cout, s, res in zip(in_ch, out_ch, stride, residual):
        lo = -(-l // s)
        a_in = l * v * cin
        a_pre = l * v * cout  # post-gcn, pre-TCN (full length)
        a_out = lo * v * cout
        words += (
            a_in + p * a_in     # aggregate: read x, write P-expanded
            + p * a_in + a_pre  # matmul: read it back, write y
            + 3 * a_pre         # BN1: stats read + normalize read/write
            + a_pre + a_out     # TCN: read once, write decimated
            + 3 * a_out         # BN2: stats read + normalize read/write
        )
        if res:
            words += a_in       # residual read
            if cin != cout or s != 1:
                words += a_out  # 1×1-conv residual write
        l = lo
    words += l * v * out_ch[-1]  # global-pool read for the head
    return words * dtype_bytes * (1.0 + bwd_factor)


def param_words(params) -> int:
    """Parameter count ('memory words' in the reference's table)."""
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))
