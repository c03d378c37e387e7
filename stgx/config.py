"""Config system: JSON file ⊕ CLI override (CLI wins), reference schema.

Mirrors the reference's four config groups — ``processor``, ``arch``,
``optimizer``, ``job`` (/root/reference/utils/config_parser.py:22-56 and
config/pku-mmd/as_is/rtstgcn_vsc.json:1-60) — with the same precedence rule:
explicit CLI values override JSON, JSON fills the rest. Overrides are dotted
``--set group.key=value`` pairs instead of the reference's flattened-flag
re-parse.

Also owns the arch-dict → model-instance builder, which translates the
reference's per-model layer-array schema into stgx model constructors.
"""

from __future__ import annotations

import argparse
import json
from typing import Any

from stgx.graph import load_skeleton
from stgx.models import MODELS

__all__ = ["load_config", "build_model", "make_parser", "parse_args"]

DEFAULTS: dict[str, dict[str, Any]] = {
    "processor": {
        "model": "rt-st-gcn",
        "data": None,
        "dataset_type": "dir",
        "out": "./out",
        "actions": None,
        "graph": "pku-mmd",
        "demo": [],
        "iou_threshold": [0.1, 0.25, 0.5],
        "backend": "tpu",
        "checkpoint": None,
    },
    "arch": {
        "strategy": "spatial",
        "in_feat": 3,
        "stages": 1,
        "kernel": 9,
        "output_type": "logits",
        "refine": "softmax",
        "normalization": "BatchNorm",
        "receptive_field": 50,
        "segment": None,
    },
    "optimizer": {
        "seed": 1538574472,
        "epochs": 10,
        "checkpoint_indices": [],
        "learning_rate": 5e-4,
        "learning_rate_decay": 1.0,
        "batch_size": 16,
    },
    "job": {"email": None, "log": [None, None], "verbose": 0,
            "mesh": {"data": None, "seq": 1}},
}


def _deep_update(base: dict, new: dict) -> dict:
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def _parse_value(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def load_config(config_path: str | None, overrides: list[str] | None = None) -> dict:
    cfg = json.loads(json.dumps(DEFAULTS))  # deep copy
    if config_path:
        with open(config_path) as f:
            _deep_update(cfg, json.load(f))
    for item in overrides or []:
        key, _, value = item.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return cfg


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="stgx",
        description="TPU-native spatial-temporal GNN framework "
        "(train | test | benchmark)",
    )
    sub = p.add_subparsers(dest="command", required=True)
    for name, doc in [
        ("train", "train a model, validating each epoch"),
        ("test", "evaluate a trained checkpoint"),
        ("benchmark", "streaming per-frame latency + int8 benchmark"),
        ("export", "export the streaming cell to StableHLO for serving"),
    ]:
        sp = sub.add_parser(name, help=doc)
        sp.add_argument("--config", type=str, default=None, help="JSON config")
        sp.add_argument(
            "--set",
            dest="overrides",
            action="append",
            default=[],
            metavar="GROUP.KEY=VALUE",
            help="override any config value (JSON-parsed); repeatable",
        )
    return p


def parse_args(argv=None):
    args = make_parser().parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    return args.command, cfg


# -- arch dict → model ---------------------------------------------------------


def _layer_arrays(sub: dict, defaults_len: int | None = None):
    n = sub.get("layers")
    if isinstance(n, list):
        n = n[0]
    out = {}
    for key in ("in_ch", "out_ch", "stride", "dilation", "residual", "dropout"):
        if key in sub:
            out[key] = tuple(sub[key])
    return out


def build_model(cfg: dict, num_classes: int):
    """Instantiate the configured model from the reference-schema arch group."""
    arch = cfg["arch"]
    name = cfg["processor"]["model"]
    graph = load_skeleton(cfg["processor"]["graph"])
    common = dict(
        num_classes=num_classes,
        in_feat=arch["in_feat"],
        graph=graph,
        strategy=arch.get("strategy", "spatial"),
        normalization=arch.get("normalization", "BatchNorm"),
        remat=bool(arch.get("remat", False)),
    )

    if name in ("st-gcn", "co-st-gcn", "rt-st-gcn", "aa-gcn"):
        sub = arch.get(name, arch.get("st-gcn", {}))
        kw = dict(common, kernel=sub.get("kernel", arch.get("kernel", 9)))
        kw.update(_layer_arrays(sub))
        kw["importance"] = bool(sub.get("importance", True))
        if name == "co-st-gcn":
            # the reference reuses its stride array as the conv dilation
            # (costgcn.py:166-171); accept either key
            kw.setdefault("dilation", tuple(sub.get("stride", (1,) * 9)))
            kw.pop("stride", None)
        if name == "aa-gcn":
            kw["output_type"] = arch.get("output_type", "logits")
        return MODELS[name](**kw)

    if name == "ms-tcn":
        sub = arch.get("ms-tcn", {})
        return MODELS[name](
            num_classes=num_classes,
            in_feat=arch["in_feat"],
            stages=sub.get("stages", 4),
            filters=tuple(sub.get("filters", (64,) * 4)),
            layers=tuple(sub.get("layers", (10,) * 4)),
            kernel=tuple(sub.get("kernel", (3,) * 4)),
            dropout=tuple(sub.get("dropout", (0.5,) * 4)),
            refine=arch.get("refine", "softmax"),
            output_type=arch.get("output_type", "logits"),
            remat=bool(arch.get("remat", False)),
        )

    if name == "ms-gcn":
        gen = arch.get("st-gcn", {})
        ref = arch.get("ms-tcn", {})
        kw = dict(common, kernel=gen.get("kernel", arch.get("kernel", 9)))
        kw.update(_layer_arrays(gen))
        kw["importance"] = bool(gen.get("importance", True))
        return MODELS[name](
            stages=ref.get("stages", 4),
            filters=tuple(ref.get("filters", (64,) * 4)),
            layers=tuple(ref.get("layers", (10,) * 4)),
            refine_kernel=tuple(ref.get("kernel", (3,) * 4)),
            refine_dropout=tuple(ref.get("dropout", (0.5,) * 4)),
            refine=arch.get("refine", "softmax"),
            output_type=arch.get("output_type", "logits"),
            **kw,
        )

    if name == "shift-gcn":
        sub = arch.get("shift-gcn", {})
        kw = dict(common)
        for key in ("in_ch", "out_ch", "stride", "residual"):
            if key in sub:
                kw[key] = tuple(sub[key])
        return MODELS[name](**kw)

    if name == "shift-gcn++":
        sub = arch.get("shift-gcn++", {})
        return MODELS[name](c_mul=sub.get("c_mul", 4), **common)

    if name == "shift-gcn++-teacher":
        return MODELS[name](**common)

    raise ValueError(f"unknown model: {name!r} (have {sorted(MODELS)})")
