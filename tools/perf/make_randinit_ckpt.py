"""Save a randomly-initialized {params, batch_stats} checkpoint for a
config's model — used to measure the eval CLI's end-to-end throughput
at full scale without spending a training run (detection assembly and
device work are identical regardless of the weights).

    JAX_PLATFORMS=cpu python tools/perf/make_randinit_ckpt.py \
        configs/videopose/pavenet_r50_frames3_synthetic.py \
        work_dirs/randinit/step_0
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("out", help="checkpoint path (orbax dir, e.g. .../step_0)")
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=192)
    args = p.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    from pavenet_tpu import Config
    from pavenet_tpu.config import replace_cfg_vals
    from pavenet_tpu.models.builder import build_detector

    cfg = replace_cfg_vals(Config.fromfile(args.config))
    model = build_detector(cfg.model)
    T = cfg.model.get("bbox_head", {}).get("num_frames", 3)
    # params are spatial-shape independent (convs + sine PE); init small
    H, W = args.height, args.width
    batch = {
        "img": np.zeros((1, T, H, W, 3), np.float32),
        "img_shape": np.array([[H, W]], np.int32),
        "scale_factor": np.ones((1, 2), np.float32),
    }
    # jitted init: eager init is pathologically slow over remote device
    # tunnels (same reason as apis/train.py create_train_state)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, train=False))(batch)
    tree = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), tree, force=True)
    ckptr.wait_until_finished()
    print(f"saved random-init checkpoint: {args.out}")


if __name__ == "__main__":
    main()
