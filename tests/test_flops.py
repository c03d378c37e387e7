"""Analytic complexity counters vs the reference's published table
(/root/reference/README.md:263-272). The reference's figures are rounded
and include small bookkeeping differences; require agreement within 2%."""

from stgx.utils.flops import (
    costgcn_macs_per_frame,
    rt_stgcn_macs_per_frame,
    stgcn_macs_per_window,
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
