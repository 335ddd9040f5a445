#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) into a flax/orbax
checkpoint loadable by ``tools/test.py`` / ``tools/train.py --resume-from``.

Reference surface: the reference consumes raw torch ``state_dict``
checkpoints (``mmcv/runner/checkpoint.py``); this rebuild stores
{params, batch_stats} trees via orbax.  The per-family tree mappings live
in ``pavenet_tpu/utils/weight_convert.py`` (each parity-tested against the
torch reference); this CLI just dispatches on the config's detector type.

Usage:
    python tools/dataset_converters/torch2flax.py <config.py> <ckpt.pth>
        <out_dir> [--strict] [--cfg-options ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(
        description="Reference .pth -> flax/orbax checkpoint")
    p.add_argument("config", help="pavenet_tpu config describing the model")
    p.add_argument("checkpoint", help="reference torch .pth")
    p.add_argument("out_dir", help="output orbax checkpoint directory")
    p.add_argument("--strict", action="store_true",
                   help="fail if any reference key is left unconverted")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def load_state_dict(path):
    import numpy as np
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    # strip DDP 'module.' prefixes like mmcv's load_checkpoint does
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def convert(model, state_dict):
    """Dispatch to the family converter; returns a variables dict with a
    ``_unused_reference_keys`` report entry."""
    import jax
    import numpy as np
    from pavenet_tpu.models.detectors import VideoPoseDetector
    from pavenet_tpu.models.detectors.soit import SOITDetector
    from pavenet_tpu.models.detectors.inspose import InsPoseDetector
    from pavenet_tpu.utils import weight_convert as wc

    if isinstance(model, VideoPoseDetector):
        common = dict(num_decoder_layers=model.num_decoder_layers,
                      num_refine_layers=model.num_refine_layers,
                      num_encoder_layers=model.num_encoder_layers,
                      backbone_depth=model.backbone_depth)
        if model.num_frames == 1:
            # PETR tree lacks sigma branches/flows: init supplies them
            from pavenet_tpu.models.zoo import dummy_clip_batch
            batch = dummy_clip_batch(
                np.random.RandomState(0), num_frames=1, height=128,
                width=192, num_keypoints=model.num_keypoints,
                max_gt=4, train=True)
            init_vars = jax.jit(lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, batch, train=True))()
            return wc.convert_petr_state_dict(
                state_dict, init_vars["params"],
                backbone_type=model.backbone_type,
                swin_depths=model.swin_depths,
                hrnet_width=model.hrnet_width, **common)
        if model.backbone_type != "resnet":
            raise SystemExit(
                f"video converter supports ResNet trees; got "
                f"backbone_type={model.backbone_type!r} (convert the "
                f"backbone via utils.weight_convert._swin/_hrnet)")
        return wc.convert_videopose_state_dict(
            state_dict, num_frames=model.num_frames, **common)
    if isinstance(model, SOITDetector):
        return wc.convert_soit_state_dict(
            state_dict, num_decoder_layers=model.num_decoder_layers,
            num_encoder_layers=model.num_encoder_layers,
            num_heads=model.num_heads,
            backbone_depth=model.backbone_depth)
    if isinstance(model, InsPoseDetector):
        return wc.convert_inspose_state_dict(
            state_dict, stacked_convs=model.stacked_convs,
            stacked_convs_kpt=model.stacked_convs_kpt,
            stacked_convs_hm=model.stacked_convs_hm,
            with_hm=model.with_hm,
            backbone_depth=model.backbone_depth)
    raise SystemExit(f"no converter for {type(model).__name__}")


def main():
    args = parse_args()
    import orbax.checkpoint as ocp
    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.config import replace_cfg_vals
    from pavenet_tpu.models.builder import build_detector

    cfg = Config.fromfile(args.config)
    cfg = replace_cfg_vals(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    model = build_detector(cfg.model)
    state_dict = load_state_dict(args.checkpoint)

    variables = convert(model, state_dict)
    unused = variables.pop("_unused_reference_keys", [])
    if unused:
        msg = (f"{len(unused)} reference keys not converted: "
               f"{sorted(unused)[:8]}{' ...' if len(unused) > 8 else ''}")
        if args.strict:
            raise SystemExit(msg)
        print(f"warning: {msg}")

    out = os.path.abspath(args.out_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})})
    ckptr.wait_until_finished()
    import jax
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"wrote {out} ({n:,} params); evaluate with "
          f"tools/test.py {args.config} {out}"
          f"{' --eval bbox' if type(model).__name__ != 'VideoPoseDetector' else ''}")


if __name__ == "__main__":
    main()
