"""Native C++ npy loader: parity with numpy, prefetcher ordering, fallbacks."""

import os

import numpy as np
import pytest

from stgx.native import Prefetcher, available, load_npy_f32


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, dtype in enumerate([np.float32, np.float64, np.int32, np.int64]):
        a = (rng.normal(size=(3, 5, 7)) * 10).astype(dtype)
        p = str(d / f"arr{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a.astype(np.float32))
    return paths, arrays


def test_native_build():
    assert available(), "g++ build of the native loader failed"


def test_load_matches_numpy(npy_files):
    paths, arrays = npy_files
    for p, a in zip(paths, arrays):
        got = load_npy_f32(p)
        np.testing.assert_array_equal(got, a)
        assert got.dtype == np.float32


def test_prefetcher_order_and_values(npy_files):
    paths, arrays = npy_files
    with Prefetcher(paths * 3, ahead=2, threads=3) as pf:
        got = list(pf)
    assert len(got) == len(paths) * 3
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, arrays[i % len(arrays)])


def test_missing_file_falls_back_cleanly(tmp_path):
    with pytest.raises(Exception):
        load_npy_f32(str(tmp_path / "nope.npy"))
