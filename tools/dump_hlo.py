"""Dump the compiled HLO of the production eval frame and print the
definitions of named fusions (to cross-reference tools/profile_trace.py
output). Usage: python tools/dump_hlo.py [fusion.80 fusion.84 ...]"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model, memory_shape
    from streammos_tpu.models.stream_mos import (featurize, stage_forward,
                                                 tta_expand_folded,
                                                 tta_scores)

    cfg = get_config("StreamMOS")
    m = cfg.model
    N = cfg.val.frame_point_num
    TTA, T = 4, m.seq_num
    model, variables = init_model(jax.random.key(0), m, batch=TTA,
                                  num_points=N, tta_fold=True)
    rng = np.random.default_rng(0)
    xyzi = jnp.asarray(rng.uniform(-50, 50, (1, T, N, 4)).astype(np.float32))
    memory = jnp.zeros(memory_shape(m, TTA), jnp.float32)

    def frame(variables, xyzi, memory):
        batch = featurize(tta_expand_folded(xyzi), m)
        out, _ = stage_forward(model, variables, batch, memory,
                               jnp.asarray(True), train=False)
        scores = tta_scores(out["pred_folded"], m.class_num)
        return scores.sum(), out["memory"]

    txt = jax.jit(frame).lower(variables, xyzi, memory).compile().as_text()
    path = "/tmp/eval_frame.hlo"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path}: {len(txt)} bytes", flush=True)
    for name in sys.argv[1:]:
        print("=" * 20, name)
        lines = txt.splitlines()
        for i, ln in enumerate(lines):
            if f"%{name} " in ln or f" {name} = " in ln or ln.lstrip().startswith(f"%{name}.") :
                print(ln[:400])


if __name__ == "__main__":
    main()
