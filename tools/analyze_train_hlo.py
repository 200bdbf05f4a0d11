"""Attribute the train step's device time op-by-op: dump the compiled train
HLO, parse the newest train trace (tools/profile_trace.py train must have run
first, or pass --trace), and join each timed fusion to its HLO metadata
(op_name + source file:line) — so the "custom fusion" bucket becomes a named
table of scatter-adds (gather VJPs), scatter-maxes (forward voxel pools), and
gathers (scatter-max VJPs + forward bilinear gathers), grouped by source site.

This is the attribution step of the train roofline (VERDICT r4 task 1).

Usage: python tools/analyze_train_hlo.py [--trace DIR] [--bs B] [--top N]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def dump_train_hlo(path, B=1):
    import jax
    import jax.numpy as jnp
    from streammos_tpu.config import get_config
    from streammos_tpu.models import init_model
    from streammos_tpu.train import build_optimizer
    from streammos_tpu.train.trainer import create_train_state, make_train_step

    cfg = get_config("StreamMOS")
    m = cfg.model
    S, T, N = 3, m.seq_num, cfg.train.frame_point_num
    model, variables = init_model(jax.random.key(0), m, batch=B, num_points=N)
    tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    windows = {
        "xyzi": jnp.asarray(
            rng.uniform(-50, 50, (S, B, T, N, 4)).astype(np.float32)),
        "targets": jnp.asarray(
            rng.integers(0, 3, (S, B, N)).astype(np.int32)),
    }
    txt = step.lower(state, windows, jax.random.key(1)).compile().as_text()
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path}: {len(txt)/1e6:.1f} MB", flush=True)
    return txt


def parse_trace(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    trace_path = max(paths, key=os.path.getmtime)
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = {}
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.isdigit():
            continue
        a = agg.setdefault(name, [0.0, 0])
        a[0] += e.get("dur", 0.0)
        a[1] += 1
    return agg


DEF_RE = re.compile(r"^\s+%?([\w.\-]+) = (\S+) ([\w\-]+)\(")
OPNAME_RE = re.compile(r'op_name="([^"]*)"')
SRC_RE = re.compile(r'source_file="([^"]*)" source_line=(\d+)')


def parse_defs(txt):
    """instruction name -> (out shape, hlo op, op_name, src_file, src_line)."""
    defs = {}
    for line in txt.splitlines():
        m = DEF_RE.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        mo = OPNAME_RE.search(line)
        ms = SRC_RE.search(line)
        defs[name] = (shape, op, mo.group(1) if mo else "",
                      ms.group(1) if ms else "", ms.group(2) if ms else "")
    return defs


def site_of(op_name, sf, sl):
    if sf:
        return f"{os.path.basename(sf)}:{sl}"
    return op_name.split("/")[-1] if op_name else "?"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/smtrace_train1")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--hlo", default="/tmp/train_step.hlo")
    ap.add_argument("--top", type=int, default=50)
    args = ap.parse_args()

    if os.path.exists(args.hlo) and os.path.getsize(args.hlo) > 0:
        txt = open(args.hlo).read()
        print(f"using cached {args.hlo}", flush=True)
    else:
        txt = dump_train_hlo(args.hlo, args.bs)

    agg = parse_trace(args.trace)
    defs = parse_defs(txt)

    rows = []
    by_site = {}
    by_tag = {}
    for name, (dur, cnt) in agg.items():
        ms = dur / 1e3
        shape, op, op_name, sf, sl = defs.get(
            name, ("?", "?", "", "", ""))
        # classify by the op_name's last path element (jax primitive name)
        prim = op_name.split("/")[-1] if op_name else op
        # fold transpose(scatter)-style wrappers: keep the word that matters
        tag = next((w for w in ("scatter-max", "scatter-add", "scatter",
                                "gather", "sort", "conv", "dot",
                                "reduce_window") if w in prim), prim)
        site = site_of(op_name, sf, sl)
        key = (tag, site)
        by_site[key] = by_site.get(key, 0.0) + ms
        by_tag[tag] = by_tag.get(tag, 0.0) + ms
        rows.append((ms, name, shape, prim, site))

    print("-- by primitive tag --")
    for tag, ms in sorted(by_tag.items(), key=lambda kv: -kv[1]):
        if ms >= 0.3:
            print(f"{ms:9.3f} ms  {tag}")
    print("-- by (tag, source site), >= 0.5 ms --")
    for (tag, site), ms in sorted(by_site.items(), key=lambda kv: -kv[1]):
        if ms >= 0.5:
            print(f"{ms:9.3f} ms  {tag:14s} {site}")
    rows.sort(reverse=True)
    print(f"-- top {args.top} ops --")
    for ms, name, shape, prim, site in rows[:args.top]:
        print(f"{ms:8.3f} ms  {name:14s} {prim[:28]:28s} {site:28s} "
              f"out={shape[:44]}")


if __name__ == "__main__":
    main()
