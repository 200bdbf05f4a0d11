"""Per-op HBM floor table (VERDICT r4 task 4): join a captured profile trace
with the compiled HLO and, for every timed fusion, compute the op's minimum
HBM traffic (sum of its fused computation's parameter shapes + output shape —
each operand read once, the output written once) and the bandwidth it
actually achieved. Ops running near the chip's streaming bandwidth are AT
their floor; ops far below it have headroom (or are latency/row-bound, which
the scatter/gather rooflines cover separately).

Usage:
  python tools/profile_trace.py [eval|train]        # capture the trace
  python tools/bench_op_floors.py [--mode eval] [--families elementwise ...]

The chip's achievable stream bandwidth is measured inline (a fused
read+reduce pass over a 245 MB array) so the floor column is grounded in the
same session, not a datasheet number.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from analyze_train_hlo import OPNAME_RE, SRC_RE, parse_trace

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s64": 8,
               "u8": 1, "s8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(sh: str) -> int:
    total = 0
    for m in SHAPE_RE.finditer(sh):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


COMP_HDR_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(\(.*\))\s*->\s*(\S+)")
FUSION_RE = re.compile(
    r"^\s+%?([\w.\-]+) = (\S+) fusion\(.*calls=%?([\w.\-]+)")
# standalone data-formatting instructions the trace times under their own
# names (no fused computation): copies, pads, transposes, bitcast-copies.
# Their floor is in-bytes + out-bytes of the one instruction.
FORMAT_RE = re.compile(
    r"^\s+%?([\w.\-]+) = (\S+) (copy|pad|transpose|bitcast-convert)\(")


def parse_hlo(txt):
    """instr name -> (out shape str, param shapes str, op_name, src).

    Covers named fusions (operand shapes from the called computation's
    signature) and standalone formatting ops (operand ~= output shape)."""
    comp_sig = {}
    for line in txt.splitlines():
        if line and not line[0].isspace() and "{" in line:
            m = COMP_HDR_RE.match(line)
            if m:
                comp_sig[m.group(1)] = (m.group(2), m.group(3))
    out = {}
    for line in txt.splitlines():
        m = FUSION_RE.match(line)
        if m:
            name, shape, comp = m.groups()
            params, _ = comp_sig.get(comp, ("", ""))
            op_kind = None
        else:
            m = FORMAT_RE.match(line)
            if not m:
                continue
            name, shape, op_kind = m.groups()
            params = shape  # one operand, same element count as the output
        mo = OPNAME_RE.search(line)
        ms = SRC_RE.search(line)
        src = (os.path.basename(ms.group(1)) + ":" + ms.group(2)) if ms \
            else ""
        op_name = mo.group(1) if mo else ""
        if op_kind is not None:
            op_name = (op_name + "/" + op_kind) if op_name else op_kind
        out[name] = (shape, params, op_name, src)
    return out


def family_of(op_name: str) -> str:
    prim = op_name.split("/")[-1] if op_name else "?"
    for w in ("scatter-max", "scatter-add", "scatter", "gather", "sort",
              "conv", "dot"):
        if w in prim:
            return w
    if prim in ("copy", "pad", "transpose", "bitcast-convert"):
        return "formatting"
    return "elementwise"


def measure_bw():
    import jax
    import jax.numpy as jnp

    big = jax.jit(lambda k: jax.random.normal(
        k, (480000, 256), jnp.bfloat16))(jax.random.key(0))
    nbytes = 480000 * 256 * 2

    @jax.jit
    def read(c, x):
        for _ in range(32):
            c = c + jnp.maximum(x + c.astype(jnp.bfloat16), 0.25
                                ).astype(jnp.float32).mean() * 1e-6 + 1
        return c

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(jnp.zeros((8, 8))))
    t0 = time.perf_counter()
    float(trivial(jnp.zeros((8, 8))))
    rtt = time.perf_counter() - t0
    init = jnp.zeros((), jnp.float32)
    float(read(init, big))
    float(read(init, big))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(read(init, big))
        ts.append(time.perf_counter() - t0)
    ms = (np.median(ts) - rtt) / 32
    return nbytes / ms / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="eval", choices=["eval", "train"])
    ap.add_argument("--trace", default=None)
    ap.add_argument("--hlo", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--families", nargs="*",
                    default=["elementwise", "formatting"],
                    help="op families to tabulate (default: the residue — "
                         "elementwise + formatting; scatter/gather/conv "
                         "have their own rooflines)")
    ap.add_argument("--min-ms", type=float, default=0.15)
    args = ap.parse_args()

    trace_dir = args.trace or (
        "/tmp/smtrace_eval" if args.mode == "eval" else "/tmp/smtrace_train1")
    hlo_path = args.hlo or (
        "/tmp/eval_frame.hlo" if args.mode == "eval"
        else "/tmp/train_step.hlo")
    n_iters = 2 if args.mode == "eval" else 1

    if not os.path.exists(hlo_path):
        raise SystemExit(f"{hlo_path} missing — run tools/dump_hlo.py "
                         "(eval) or tools/analyze_train_hlo.py (train) first")
    txt = open(hlo_path).read()
    fus = parse_hlo(txt)
    agg = parse_trace(trace_dir)

    print("measuring stream bandwidth...", flush=True)
    bw = measure_bw()
    print(f"achievable stream BW (fused read+reduce): {bw:.0f} GB/s")

    rows = []
    for name, (dur, cnt) in agg.items():
        ms = dur / 1e3 / n_iters
        if ms < args.min_ms or name not in fus:
            continue
        shape, params, op_name, src = fus[name]
        fam = family_of(op_name)
        if args.families and fam not in args.families:
            continue
        nbytes = shape_bytes(shape) + shape_bytes(params)
        floor_ms = nbytes / (bw * 1e9) * 1e3
        rows.append((ms, name, src, nbytes, floor_ms,
                     ms / max(floor_ms, 1e-9), shape[:40]))
    rows.sort(reverse=True)
    print(f"-- {args.mode} residue ops >= {args.min_ms} ms "
          f"(families: {args.families}) --")
    print(f"{'ms':>8s} {'floor':>7s} {'x-floor':>8s} {'MB':>7s}  "
          f"{'site':<22s} {'name':<14s} out")
    tot_ms = tot_floor = 0.0
    for ms, name, src, nbytes, floor_ms, ratio, shape in rows[:args.top]:
        tot_ms += ms
        tot_floor += floor_ms
        print(f"{ms:8.3f} {floor_ms:7.3f} {ratio:8.2f} {nbytes/1e6:7.1f}  "
              f"{src:<22s} {name:<14s} {shape}")
    if rows:
        print(f"{tot_ms:8.3f} {tot_floor:7.3f} {tot_ms/max(tot_floor,1e-9):8.2f}"
              f"   TOTAL (top {min(args.top, len(rows))})")


if __name__ == "__main__":
    main()
