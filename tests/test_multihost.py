"""Multi-process (multi-host simulation) training test.

Launches two real processes that form a jax.distributed cluster (one
CPU device each), build a global ('data','model') mesh spanning both,
and run one sharded GAN train step — validating the multi-host path
(SURVEY.md §2d: jax.distributed.initialize + DCN) without TPU pods.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
import jax.numpy as jnp
from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.parallel.mesh import make_mesh
from piper_tpu.parallel.sharding import make_sharded_train_step
from piper_tpu.train.step import init_train_state
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.device_count() == 2 and jax.local_device_count() == 1

cfg = ModelConfig(
    num_symbols=40, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, resblock="2",
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
    upsample_rates=(4, 4), upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8), spec_channels=33, segment_size=256,
    flow_n_layers=2,
    audio=AudioConfig(sample_rate=16000, filter_length=64, hop_length=16,
                      win_length=64, mel_channels=20),
)
mesh = make_mesh(data=2, model=1)
state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
step = make_sharded_train_step(cfg, tx, mesh)

rng = np.random.default_rng(0)  # same data on both processes
b, t_x, t_y = 4, 12, 40
host = {
    "ids": rng.integers(0, 40, (b, t_x)).astype(np.int32),
    "id_lengths": np.full((b,), t_x, np.int32),
    "spec": np.abs(rng.standard_normal((b, t_y, 33))).astype(np.float32),
    "spec_lengths": np.full((b,), t_y, np.int32),
    "audio": (rng.standard_normal((b, t_y * 16)) * 0.1).astype(np.float32),
}
with mesh:
    sharding = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in host.items()
    }
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    out = {k: float(v) for k, v in metrics.items()}
print("RESULT " + json.dumps(out))
"""


def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO=str(Path(__file__).parent.parent),
            COORD=coord,
            PROC_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p in procs:
        out, err = p.communicate(timeout=850)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out
        results.append(json.loads(line[0][len("RESULT "):]))

    # both processes observe the same (all-reduced) losses
    for k in ("loss_gen_all", "loss_disc_all", "loss_mel"):
        assert abs(results[0][k] - results[1][k]) < 1e-3, (k, results)
        assert results[0][k] == results[0][k]  # not NaN


WORKER_CKPT = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
import jax.numpy as jnp
from pathlib import Path
from piper_tpu.config import AudioConfig, ModelConfig
from piper_tpu.parallel.mesh import make_mesh
from piper_tpu.parallel.sharding import make_sharded_train_step
from piper_tpu.train.step import init_train_state
from piper_tpu.train.__main__ import restore_checkpoint, save_checkpoint
from jax.sharding import NamedSharding, PartitionSpec as P

# 2 processes x 2 local devices = 4 global devices: 'data' spans
# processes (DCN-like), 'model' stays intra-process (ICI-like).
assert jax.device_count() == 4 and jax.local_device_count() == 2

cfg = ModelConfig(
    num_symbols=40, inter_channels=32, hidden_channels=32,
    filter_channels=64, n_heads=2, n_layers=1, resblock="2",
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
    upsample_rates=(4, 4), upsample_initial_channel=64,
    upsample_kernel_sizes=(8, 8), spec_channels=33, segment_size=256,
    flow_n_layers=2,
    audio=AudioConfig(sample_rate=16000, filter_length=64, hop_length=16,
                      win_length=64, mel_channels=20),
)
mesh = make_mesh(data=2, model=2)
state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
step = make_sharded_train_step(cfg, tx, mesh)

rng = np.random.default_rng(0)
b, t_x, t_y = 4, 12, 40
host = {
    "ids": rng.integers(0, 40, (b, t_x)).astype(np.int32),
    "id_lengths": np.full((b,), t_x, np.int32),
    "spec": np.abs(rng.standard_normal((b, t_y, 33))).astype(np.float32),
    "spec_lengths": np.full((b,), t_y, np.int32),
    "audio": (rng.standard_normal((b, t_y * 16)) * 0.1).astype(np.float32),
}
with mesh:
    sharding = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in host.items()
    }
    state1, m1 = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(m1["loss_gen_all"])

    # Multi-host checkpoint: every process participates in the orbax
    # save of the GLOBAL (sharded) state — no device_get funnel.
    ckpt_dir = Path(os.environ["CKPT_DIR"])
    save_checkpoint(ckpt_dir, state1, 1)

    # Fresh state, different seed -> different params; restore must
    # bring back state1 exactly on every process.
    state_f, _ = init_train_state(jax.random.PRNGKey(123), cfg)
    restored, step_no = restore_checkpoint(ckpt_dir, state_f)
    assert step_no == 1

    def norm(tree):
        return float(
            jax.jit(
                lambda t: sum(
                    jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree.leaves(t)
                )
            )(tree)
        )

    n_trained, n_restored = norm(state1.params_g), norm(restored.params_g)
    assert abs(n_trained - n_restored) < 1e-4 * max(1.0, n_trained)

    # And training continues from the restored state.
    state2, m2 = step(restored, batch, jax.random.PRNGKey(2))
    out = {"loss_gen_all": float(m2["loss_gen_all"]),
           "restored_norm": n_restored}
print("RESULT " + json.dumps(out))
"""


def test_two_process_checkpoint_save_restore(tmp_path):
    """Multi-host orbax checkpointing: save the sharded global state
    from 2 processes (2 devices each), restore, continue training."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER_CKPT)
    ckpt_dir = tmp_path / "ckpt"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO=str(Path(__file__).parent.parent),
            COORD=coord,
            PROC_ID=str(pid),
            JAX_PLATFORMS="cpu",
            CKPT_DIR=str(ckpt_dir),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p in procs:
        out, err = p.communicate(timeout=850)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out
        results.append(json.loads(line[0][len("RESULT "):]))

    assert abs(results[0]["restored_norm"] - results[1]["restored_norm"]) < 1e-3
    for r in results:
        assert r["loss_gen_all"] == r["loss_gen_all"]  # not NaN
