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


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_actions_resolve(path):
    """Every non-synth config's ``processor.actions`` path must resolve to a
    bundled action spec (reference ships data/*/actions.txt, consumed at
    processor.py:87-98) with the class count the config's dataset implies."""
    from stgx.data import load_actions

    cfg = load_config(path)
    actions_path = cfg["processor"].get("actions")
    if actions_path is None or "synth" in path:
        return
    resolved = os.path.join(REPO, actions_path)
    assert os.path.exists(resolved), f"missing bundled action spec {actions_path}"
    actions = load_actions(resolved)
    expected = 52 if "pku" in path else 8
    assert len(actions) == expected
    assert actions[0] in ("background", "Non-FOG")  # class 0 = background


def test_config_matrix_covers_all_families():
    models = {load_config(p)["processor"]["model"] for p in CONFIGS}
    assert models >= {
        "st-gcn", "rt-st-gcn", "co-st-gcn", "aa-gcn", "ms-tcn", "ms-gcn",
        "shift-gcn", "shift-gcn++",
    }
