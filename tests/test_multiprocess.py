"""Two-process `jax.distributed` CPU test of the per-host data path.

Round-1 validated data parallelism on a single-process 8-device mesh; this
covers what that cannot: `parallel.initialize_distributed` +
`process_shard_indices` + `host_local_to_global` with REAL process
boundaries (the reference's DDP launch, `train_StreamMOS.py:128-150`, is a
2-process NCCL job — this is its CPU-backend equivalent).

Each process gets 1 local CPU device, builds the 2-device global mesh,
contributes its local shard of a global batch, and the jitted global sum
must equal the full-batch sum on both processes (proving the shards were
assembled in the right order and the collective spans processes).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

import numpy as np
import jax.numpy as jnp
from streammos_tpu import parallel

coord, pid = sys.argv[1], int(sys.argv[2])
parallel.initialize_distributed(coord, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

mesh = parallel.data_mesh()
num_samples, global_bs = 10, 4
order = parallel.process_shard_indices(
    num_samples, np.random.default_rng(0), global_bs)
# padded to 12 globally, stride-sliced by process -> 6 each, disjoint
assert len(order) == 6, order
print("ORDER", pid, ",".join(map(str, order.tolist())), flush=True)

# global batch: process p contributes rows [p*2, p*2+2) of each batch
data = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
local = data[pid * 2:(pid + 1) * 2]
gb = parallel.host_local_to_global(mesh, {"x": local}, axis=0)["x"]
assert gb.shape == (4, 3), gb.shape

total = jax.jit(lambda x: x.sum())(gb)
expect = float(data.sum())
assert abs(float(total) - expect) < 1e-6, (float(total), expect)
print("OK", pid, float(total), flush=True)

# --- full train step over the 2-process mesh (train_StreamMOS.py:128-150
# parity: DDP forward/backward across real process boundaries) ---
from streammos_tpu.config import get_config
from streammos_tpu.models import init_model
from streammos_tpu.train import (build_optimizer, create_train_state,
                                 make_train_step)

cfg = get_config("StreamMOS_tiny")
B, S, N = 2, 3, 256
# identical init in both processes (same key, deterministic CPU init)
model, variables = init_model(jax.random.key(0), cfg.model, batch=B,
                              num_points=N)
tx, _ = build_optimizer(cfg.optimize, per_epoch_iters=10)
step = make_train_step(model, cfg, tx, donate=False)

rng_np = np.random.default_rng(7)
windows_np = {
    "xyzi": rng_np.uniform(-18, 18, (S, B, cfg.model.seq_num, N, 4)
                           ).astype(np.float32),
    "targets": rng_np.integers(0, 3, (S, B, N)).astype(np.int32),
}
rngkey = jax.random.key(42)

# global-mesh step: this process contributes batch row [pid]
local = {k: v[:, pid:pid + 1] for k, v in windows_np.items()}
state = parallel.replicate_state(mesh, create_train_state(variables, tx))
gwin = parallel.host_local_to_global(mesh, local, axis=1)
new_state, metrics = step(state, gwin, rngkey)
loss_mesh = float(metrics["loss"])
print("LOSS", pid, repr(loss_mesh), flush=True)

if pid == 0:
    # single-device reference: the SAME global batch, unsharded, on this
    # process's one local device — the 2-process mesh step must agree
    state1 = create_train_state(variables, tx)
    _, metrics1 = step(state1, {k: jnp.asarray(v)
                                for k, v in windows_np.items()}, rngkey)
    loss1 = float(metrics1["loss"])
    print("LOSS1", repr(loss1), flush=True)
    assert abs(loss_mesh - loss1) <= 2e-4 * max(abs(loss1), 1.0), (
        loss_mesh, loss1)
print("STEP_OK", pid, flush=True)
"""


def test_two_process_data_path(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, addr, str(pid)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out[-2000:]}\n{err[-2000:]}"
        assert "OK" in out

    # the two processes' index shards must be disjoint and cover the padded
    # epoch exactly once each
    orders = {}
    for _rc, out, _err in outs:
        for line in out.splitlines():
            if line.startswith("ORDER"):
                _, pid, idx = line.split()
                orders[int(pid)] = [int(v) for v in idx.split(",")]
    both = orders[0] + orders[1]
    assert len(both) == 12
    assert sorted(set(both)) == list(range(10))  # padding repeats 2 indices
