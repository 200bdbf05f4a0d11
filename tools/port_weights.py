"""Convert a reference PyTorch StreamMOS checkpoint (.pth state_dict, saved
by `/root/reference/train_StreamMOS.py:196-197` — including the published
pretrained model, README.md:120-123) into a StreamMOS-TPU checkpoint that
`tools/val.py` / `tools/train.py --checkpoint` can consume:

    python tools/port_weights.py --pth 10-model.pth \
        --out experiments/StreamMOS_seg/ported/checkpoint --epoch 10

The presence of `refine.*` keys (stage-2) is auto-detected. The output is an
orbax directory `<out>/<epoch:04d>` holding {"params", "batch_stats"}.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description="torch -> StreamMOS-TPU weights")
    ap.add_argument("--pth", required=True, help="reference state_dict .pth")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--config", default="StreamMOS")
    args = ap.parse_args()

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models.stream_mos import StreamMOSNet, memory_shape
    from streammos_tpu.train import checkpoint as ckpt_lib
    from streammos_tpu.train.port_torch import (check_against_template,
                                                torch_state_dict_to_flax)

    sd = torch.load(args.pth, map_location="cpu")
    if not isinstance(sd, dict):
        raise SystemExit(f"{args.pth}: expected a state_dict")
    if "state_dict" in sd:  # tolerate {'state_dict': ...} wrappers
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v.detach().cpu().numpy()
          for k, v in sd.items()}

    with_refine = any(k.startswith("refine.") for k in sd)
    cfg = get_config(args.config).model
    variables = torch_state_dict_to_flax(sd, cfg, with_refine=with_refine)

    model = StreamMOSNet(cfg, with_refine=with_refine)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.seq_num, 64, 7)),
            jnp.zeros((1, cfg.seq_num, 64, 3)),
            jnp.zeros((1, cfg.seq_num, 64, 2)),
            jnp.zeros(memory_shape(cfg, 1)), jnp.asarray(False), train=False))
    problems = check_against_template(variables["params"], template["params"])
    problems += check_against_template(variables["batch_stats"],
                                       template["batch_stats"])
    if problems:
        raise SystemExit("structure mismatch:\n" + "\n".join(problems[:20]))

    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    path = ckpt_lib.save(args.out, args.epoch, variables)
    print(f"ported {len(sd)} torch keys -> {n / 1e6:.3f}M params "
          f"(refine={with_refine}) at {path}")


if __name__ == "__main__":
    main()
