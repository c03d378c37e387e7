"""Every shipped experiment config must build its model."""

import glob
import os

import pytest

from stgx.config import build_model, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.json"),
                           recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_builds_model(path):
    cfg = load_config(path)
    ncls = 52 if "pku" in path else 8
    model = build_model(cfg, num_classes=ncls)
    assert model is not None


def test_config_matrix_covers_all_families():
    models = {load_config(p)["processor"]["model"] for p in CONFIGS}
    assert models >= {
        "st-gcn", "rt-st-gcn", "co-st-gcn", "aa-gcn", "ms-tcn", "ms-gcn",
        "shift-gcn", "shift-gcn++",
    }
