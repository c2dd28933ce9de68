"""TPU-compiled (Mosaic) kernel tier — round-1 review weak item 7.

The main suite exercises the Pallas kernels in interpret mode on CPU;
this tier compiles the REAL Mosaic kernels and runs them on a TPU,
catching compile/VMEM-guard regressions (like the dtype-gating bug
fixed in 3e90cf1) that interpret mode can't see.

The suite-wide conftest pins JAX_PLATFORMS=cpu, so these tests run the
TPU work in a SUBPROCESS with a clean environment. Marked `tpu` and
skipped unless PIPER_TPU_RUN_TPU_TESTS=1 (set by `make test-tpu`):
the tunneled chip is slow to compile and not always attached.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("PIPER_TPU_RUN_TPU_TESTS") != "1",
        reason="TPU tier: set PIPER_TPU_RUN_TPU_TESTS=1 (make test-tpu)",
    ),
]

WORKER = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import jax
import jax.numpy as jnp
import numpy as np

platform = jax.devices()[0].platform.lower()
assert platform in ("tpu", "axon"), f"no TPU attached: {platform}"

from piper_tpu.config import ModelConfig
from piper_tpu.models.vits import generator as G

out = {}

# 1) Mosaic-compiled time-major generator == XLA generator (bf16).
cfg = ModelConfig(num_symbols=64)
rng = jax.random.PRNGKey(0)
dec = G.init_generator(rng, cfg)
dec = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dec)
tm = G.prepare_tm(dec, cfg, jnp.bfloat16)
b, t = 4, 128
z = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.inter_channels),
                      jnp.bfloat16)
lens = jnp.asarray([t, t - 17, t // 2, 5], jnp.int32)
mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.bfloat16)[..., None]

ref = jax.jit(
    lambda z, m: G.generator_apply(dec, z * m, m, cfg=cfg)
)(z, mask)
got = jax.jit(
    lambda z, m, l: G.generator_tm_apply(dec, tm, z * m, l, cfg=cfg)
)(z, mask, lens)
ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
err = float(np.max(np.abs(ref - got)))
out["tm_generator_max_err"] = err
assert err < 0.05, err  # bf16 kernels, tanh-bounded output

# 2) Masked tail exactness on the compiled kernel.
u = cfg.upsample_factor
for i, l in enumerate([t, t - 17, t // 2, 5]):
    tail = np.abs(got[i, l * u:])
    assert tail.max() == 0.0 if tail.size else True, (i, float(tail.max()))
out["masked_tail"] = "exact"

print("RESULT " + json.dumps(out))
"""


def test_mosaic_compiled_tm_generator():
    env = dict(os.environ)
    worker = WORKER % {"repo": str(ROOT)}
    r = subprocess.run(
        [sys.executable, "-c", worker], env=env, capture_output=True,
        text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, r.stdout
    res = json.loads(line[0][len("RESULT "):])
    assert res["masked_tail"] == "exact"


GOLDEN_WORKER = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import jax
import numpy as np

platform = jax.devices()[0].platform.lower()
assert platform in ("tpu", "axon"), f"no TPU attached: {platform}"
from piper_tpu.runtime.cache import cache_dir
jax.config.update("jax_compilation_cache_dir", cache_dir(%(repo)r + "/.jax_cache"))

from pathlib import Path
from piper_tpu.config import SynthesisConfig
from piper_tpu.ops.stft import mel_spectrogram
from piper_tpu.runtime.voice import TpuVoice

DATA = Path(%(repo)r) / "tests" / "data"
voice = TpuVoice.load(
    DATA / "voice_xlow_trained_fp16.npz", DATA / "voice_xlow_trained.json",
    precision="parity",
)
a = voice.model_cfg.audio
seqs = json.loads(sys.argv[1])
audios = voice.synthesize_ids_batch(seqs, syn=SynthesisConfig(seed=3))
golden = np.load(DATA / "golden_trained_mel.npz")
out = {"utts": len(audios)}
for i, au in enumerate(audios):
    m = np.asarray(mel_spectrogram(
        np.asarray(au, np.float32)[None, :],
        sample_rate=a.sample_rate, n_fft=a.filter_length,
        hop_length=a.hop_length, win_length=a.win_length,
        n_mels=a.mel_channels, fmin=a.mel_fmin, fmax=a.mel_fmax,
    ))[0]
    g = golden[f"mel_{i}"].astype(np.float32)
    # duration ceil can flip whole frames across platforms at trained
    # weights (docs/PARITY.md); allow a small count drift, compare the
    # common frames
    assert abs(m.shape[1] - g.shape[1]) <= max(2, int(0.02 * g.shape[1])), (
        i, m.shape, g.shape
    )
    n = min(m.shape[1], g.shape[1])
    d = np.abs(m[:, :n] - g[:, :n])
    out[f"mel_diff_max_{i}"] = round(float(d.max()), 4)
    out[f"mel_diff_p99_{i}"] = round(float(np.percentile(d, 99)), 4)
    # robust thresholds: cross-platform f32 noise log-amplifies at
    # near-silent frames (measured: mean 0.018, p99 0.073, max 0.13-
    # 0.18 always at golden ~ -4.3 on a [-4.5, 0.87] scale); a real
    # serving defect moves the mean/p99, not just quiet-frame maxima
    assert float(d.mean()) < 0.03, (i, float(d.mean()))
    assert float(np.percentile(d, 99)) < 0.12, (i, out[f"mel_diff_p99_{i}"])
    assert float(d.max()) < 0.5, (i, out[f"mel_diff_max_{i}"])
print("RESULT " + json.dumps(out))
"""


def test_trained_golden_serving_on_tpu():
    """The committed trained voice through the FULL serving runtime on
    the real chip, against the committed CPU-generated golden mel:
    end-to-end proof that a trained voice serves correctly on TPU
    hardware, not just under the CPU test backend."""
    sys.path.insert(0, str(ROOT / "tests"))
    from test_golden_trained import GOLDEN, _sentences

    if not GOLDEN.exists():
        pytest.skip("golden snapshot missing")
    from piper_tpu.config import VoiceConfig

    cfg = VoiceConfig.from_file(ROOT / "tests/data/voice_xlow_trained.json")
    seqs = _sentences(cfg.num_symbols)
    r = subprocess.run(
        [sys.executable, "-c", GOLDEN_WORKER % {"repo": str(ROOT)},
         json.dumps(seqs)],
        env=dict(os.environ), capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, r.stdout
    res = json.loads(line[0][len("RESULT "):])
    assert res["utts"] == len(seqs)
