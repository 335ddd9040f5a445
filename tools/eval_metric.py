#!/usr/bin/env python
"""Offline re-evaluation of dumped detections
(reference surface: ``tools/eval_metric.py``).

Usage: python tools/eval_metric.py CONFIG RESULTS_JSON
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    # some environments pre-register an accelerator plugin that wins over
    # the env var; re-assert the user's choice (without this, the eval
    # keypoint sigmoid/jnp work claims the accelerator and can block on a
    # busy device — the other CLI tools carry the same guard)
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="detections json from tools/test.py --out")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.registry import DATASETS
    import pavenet_tpu.datasets  # noqa: F401 — populate the registry
    from pavenet_tpu.apis.test import evaluate_dataset

    cfg = Config.fromfile(args.config)
    from pavenet_tpu.config import replace_cfg_vals, update_data_root
    cfg = replace_cfg_vals(cfg)
    update_data_root(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    test_cfg = dict(cfg.data["test"])
    test_cfg.pop("pipeline", None)
    dataset = DATASETS.build(dict(**test_cfg, pipeline=None))
    with open(args.results) as f:
        detections = json.load(f)
    for k, v in evaluate_dataset(dataset, detections).items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
