"""Analytic complexity counters vs the reference's published table
(/root/reference/README.md:263-272). The reference's figures are rounded
and include small bookkeeping differences; require agreement within 2%."""

from stgx.utils.flops import (
    costgcn_macs_per_frame,
    rt_stgcn_macs_per_frame,
    rt_stgcn_train_hbm_bytes_per_frame,
    stgcn_macs_per_window,
    stgcn_train_hbm_bytes_per_window,
)


def _close(ours, published, tol=0.02):
    assert abs(ours - published) / published < tol, (ours, published)


def test_rtstgcn_macs_matches_published():
    _close(rt_stgcn_macs_per_frame(), 20.1e6)


def test_costgcn_macs_matches_published():
    _close(costgcn_macs_per_frame(), 78.6e6)
    _close(costgcn_macs_per_frame(kernel=69), 468e6)


def test_stgcn_window_macs_positive_and_scaling():
    w50 = stgcn_macs_per_window(window=50)
    w100 = stgcn_macs_per_window(window=100)
    assert w50 > 0 and w100 > 1.8 * w50


def test_window_hbm_model_pins_round4_audit_numbers():
    # the rooflines docs/PERF.md's round-4 window audit derives: 80.95
    # MB/window bf16 fwd+bwd (HBM SoL 10.1k win/s) — and the per-frame
    # co-st-gcn variant (window=1, no stride decimation) at 3.30 MB/frame
    b = stgcn_train_hbm_bytes_per_window()
    assert abs(b - 80.95e6) / 80.95e6 < 0.01, b
    bc = stgcn_train_hbm_bytes_per_window(window=1, stride=(1,) * 9)
    assert abs(bc - 3.303e6) / 3.303e6 < 0.01, bc
    # the family invariant the audit established: HBM binds, not the MXU
    # (bytes/window × MXU-peak > flops/window × HBM-bw  ⇔  HBM SoL < MXU SoL)
    flops = 3 * 2 * stgcn_macs_per_window()
    assert b * 197e12 > flops * 819e9
    # fp32 doubles the traffic; dropping the backward scales by 1/3
    assert abs(stgcn_train_hbm_bytes_per_window(dtype_bytes=4) - 2 * b) < 1
    assert abs(
        stgcn_train_hbm_bytes_per_window(bwd_factor=0.0) - b / 3
    ) < 1


def test_rt_hbm_model_unchanged():
    # the RT speed-of-light PERF.md/README quote: 2.60 MB/frame bf16
    b = rt_stgcn_train_hbm_bytes_per_frame()
    assert abs(b - 2.60e6) / 2.60e6 < 0.01, b
