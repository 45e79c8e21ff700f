"""Cross-process (multi-host analogue) training-step overhead measurement.

Real multi-host TPU hardware is unavailable in this environment (BASELINE.md),
so the scaling-efficiency claim is correctness-proven (sharded == single-device
runs) but needs at least one wall-clock data point. This harness provides it:
the SAME 2-device data-parallel tower train step, at the SAME per-device batch,
on (a) a single-process 2-device CPU mesh and (b) a 2-process jax.distributed
mesh (1 device per process, gradient psum over Gloo — the DCN analogue). The
per-step delta is the cross-process collective + multi-controller dispatch
overhead; DP scaling efficiency at N hosts ~= t_local / (t_local + overhead).

Usage:  python benchmarks/multiprocess_overhead.py
Prints one line per configuration plus the overhead summary.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

STEPS = 30
WARMUP = 5
D, N, B_PER_DEV, L = 256, 1024, 64, 32

WORKER = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.config import (
    MeshConfig, TowerConfig, TrainConfig,
)
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.parallel import (
    build_mesh, make_sharded_tower_train_step,
)
from news_recommendation_project_v2_tpu.parallel.sharding import (
    batch_sharding, put_global, replicated,
)
from jax.sharding import NamedSharding, PartitionSpec as P
from news_recommendation_project_v2_tpu.train.step import make_tower_train_step
from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

STEPS, WARMUP, D, N, B_PER_DEV, L = %(consts)s
ndev_total = 2
mesh = build_mesh(MeshConfig(data_size=ndev_total, model_size=1))
B = B_PER_DEV * ndev_total
tower = build_tower(
    TowerConfig(kind="latent", reduced_dim=D, num_latents=8, latent_dim_head=32)
)
params = jax.jit(
    lambda: tower.init(jax.random.key(0), jnp.zeros((1, L, D)), jnp.ones((1, L)))
)()
cfg = TrainConfig()
optimizer = make_optimizer(cfg)
opt_state = jax.jit(optimizer.init)(params)
step = make_sharded_tower_train_step(
    make_tower_train_step(tower.apply, optimizer, cfg.margin), mesh, donate=False
)
rng = np.random.default_rng(0)
rep, dat = replicated(mesh), batch_sharding(mesh)
dat2 = NamedSharding(mesh, P("data", None))
tab = NamedSharding(mesh, P("model", None))
table = put_global(
    rng.standard_normal((N, D)).astype(np.float32), tab
)
args = (
    jax.tree.map(lambda l: put_global(np.asarray(l), rep), params),
    jax.tree.map(lambda l: put_global(np.asarray(l), rep), opt_state),
    table,
    table,
    put_global(rng.integers(0, N, (B, L)).astype(np.int32), dat2),
    put_global(np.ones((B, L), np.float32), dat2),
    put_global(rng.integers(0, B, B).astype(np.int32), dat),
    put_global(rng.integers(0, N, B).astype(np.int32), dat),
    put_global(rng.integers(0, N, B).astype(np.int32), dat),
    put_global(np.ones(B, np.float32), dat),
    put_global(np.asarray(jax.random.PRNGKey(1)), rep),
)
loss = None
for _ in range(WARMUP):
    _, _, loss = step(*args)
float(loss)
t0 = time.time()
for _ in range(STEPS):
    _, _, loss = step(*args)
final = float(loss)  # fetching the replicated scalar syncs the stream
dt = (time.time() - t0) / STEPS
if pid == 0:
    with open(out_path, "w") as f:
        json.dump({"step_ms": dt * 1000, "loss": final,
                   "processes": jax.process_count()}, f)
"""


def run(nproc: int, tmp: Path, attempts: int = 3) -> dict:
    consts = repr((STEPS, WARMUP, D, N, B_PER_DEV, L))
    script = tmp / f"worker_{nproc}.py"
    script.write_text(WORKER % {"consts": consts})
    last = None
    for _ in range(attempts):  # bind-then-close port pick is racy; retry
        try:
            return _run_once(nproc, tmp, script)
        except (AssertionError, subprocess.TimeoutExpired) as e:
            last = e
    raise last


def _run_once(nproc: int, tmp: Path, script: Path) -> dict:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    out = tmp / f"out_{nproc}.json"
    devs_per_proc = 2 // nproc
    env = dict(
        os.environ,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devs_per_proc}",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(Path(__file__).resolve().parent.parent),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc),
             f"127.0.0.1:{port}", str(out)],
            env=env,
        )
        for i in range(nproc)
    ]
    for p in procs:
        p.wait(timeout=900)
        assert p.returncode == 0, f"worker failed rc={p.returncode}"
    return json.loads(out.read_text())


def main() -> None:
    import tempfile

    tmp = Path(tempfile.mkdtemp())
    single = run(1, tmp)
    multi = run(2, tmp)
    overhead = multi["step_ms"] - single["step_ms"]
    eff = single["step_ms"] / multi["step_ms"]
    print(
        f"single-process 2-dev step: {single['step_ms']:.2f} ms | "
        f"2-process step: {multi['step_ms']:.2f} ms | "
        f"cross-process overhead: {overhead:+.2f} ms/step | "
        f"same-per-device-work efficiency: {eff:.1%}"
    )
    assert abs(single["loss"] - multi["loss"]) < 1e-5, (
        single["loss"], multi["loss"],
    )


if __name__ == "__main__":
    main()
