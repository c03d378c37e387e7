"""Graph builder unit tests + golden parity vs the reference implementation."""

import os

import numpy as np
import pytest

from stgx.graph import SKELETONS, Graph, load_skeleton

REF = "/root/reference"


def test_spatial_partitions_sum_to_adjacency():
    g = Graph(**load_skeleton("pku-mmd"))
    raw = g.A_spatial_raw
    assert raw.shape == (3, 25, 25)
    # partitions tile the binary adjacency exactly (reference graph.py:165-166)
    binary = (g.hop_dis <= 1).astype(float)
    np.testing.assert_array_equal(raw.sum(axis=0), binary)


def test_symmetric_normalization_rows():
    g = Graph(**load_skeleton("imu_fogit_ABCD"), normalization="symmetric")
    # alpha stabilizer keeps rows finite even for the empty far-rows of tips
    assert np.isfinite(g.A).all()
    assert g.A.shape == (3, 7, 7)


def test_uniform_strategy_is_whole_adjacency():
    # intended behavior (the reference's uniform branch is a no-op bug,
    # graph.py:134-135 — see stgx.graph docstring)
    g = Graph(**load_skeleton("hugadb"), strategy="uniform")
    assert g.A.shape == (1, 6, 6)
    assert g.A.sum() > 0


def test_distance_strategy_partition_count():
    g = Graph(**load_skeleton("coco"), strategy="distance", max_hop=2)
    assert g.A.shape[0] == 3  # hops 0, 1, 2


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("name", sorted(SKELETONS))
@pytest.mark.parametrize("strategy", ["spatial", "distance"])
@pytest.mark.parametrize("norm", ["symmetric", "nonsymmetric"])
def test_golden_vs_reference(name, strategy, norm):
    import json
    import sys

    sys.path.insert(0, REF)
    try:
        from models.utils.graph import Graph as RefGraph
    finally:
        sys.path.remove(REF)

    spec = json.load(open(f"{REF}/data/skeletons/{name}.json"))
    ref = RefGraph(
        num_node=spec["num_node"], edge=spec["edge"], center=spec["center"],
        strategy=strategy, normalization=norm,
    )
    mine = Graph(**load_skeleton(name), strategy=strategy, normalization=norm)
    np.testing.assert_allclose(mine.A, ref.A, atol=1e-12)
    np.testing.assert_allclose(mine.A_spatial_raw, ref.get_adjacency_raw(), atol=1e-12)
