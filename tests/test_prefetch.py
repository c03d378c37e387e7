"""PrefetchedDataset must be an order-independent, multi-pass-safe view."""

import numpy as np

from stgx.data.prefetch import PrefetchedDataset


class _CountingDataset:
    def __init__(self, n=10):
        self.n = n
        self.loads = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.loads.append(i)
        return np.full((3,), i), i

    def extra_api(self):
        return "ok"


def test_sequential_equivalence_two_passes():
    base = _CountingDataset(8)
    pf = PrefetchedDataset(base, ahead=3, threads=2)
    for _ in range(2):  # two epoch passes
        for i in range(len(pf)):
            x, y = pf[i]
            assert y == i and x[0] == i
    pf.close()


def test_random_access_and_delegation():
    base = _CountingDataset(10)
    pf = PrefetchedDataset(base, ahead=2)
    for i in [7, 0, 9, 3, 3]:
        _, y = pf[i]
        assert y == i
    assert pf.extra_api() == "ok"
    assert len(pf) == 10
    pf.close()
