"""Golden-output test against the committed trained voice.

The reference's de-facto oracle is a released .onnx voice plus known
output (SURVEY §4); no released voice is reachable from this
environment (zero egress), so this applies the same pattern to the
committed trained fixture voice: synthesize fixed fixture sentences
through the FULL serving runtime (TpuVoice, parity precision, fixed
seed) and compare the log-mel of the result against a committed golden
snapshot. Catches any regression in the end-to-end serving path —
text-frontend id handling, bucketing, masking, flows, vocoder, int16
conversion — at trained weights. When a released voice becomes
reachable, tests swap the fixture for it (ROADMAP #1).

The comparison is mel-domain with tolerance (atol 0.05 log-mel), not
byte-exact: float kernels differ across jax versions/platforms by ULPs
and the duration ceil can flip on them (docs/PARITY.md); mel-domain
tolerance is stable to those while failing loudly on real defects.
Regenerate after an intentional behavior change:
    python tests/test_golden_trained.py regen
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"
GOLDEN = DATA / "golden_trained_mel.npz"
FIXTURES = Path("/root/reference/etc/test_sentences")


def _sentences(num_symbols, n=3):
    seqs = []
    for p in sorted(FIXTURES.glob("test_*.jsonl")):
        for line in p.read_text().splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            s = rec["phoneme_ids"]
            if max(s) < num_symbols and 20 <= len(s) <= 80:
                seqs.append(s)
            if len(seqs) == n:
                return seqs
    return seqs


def _synthesize_mels():
    from piper_tpu.config import SynthesisConfig
    from piper_tpu.ops.stft import mel_spectrogram
    from piper_tpu.runtime.voice import TpuVoice

    voice = TpuVoice.load(
        DATA / "voice_xlow_trained_fp16.npz",
        DATA / "voice_xlow_trained.json",
        precision="parity",
    )
    a = voice.model_cfg.audio
    seqs = _sentences(voice.config.num_symbols)
    audios = voice.synthesize_ids_batch(seqs, syn=SynthesisConfig(seed=3))
    mels = []
    for au in audios:
        m = mel_spectrogram(
            np.asarray(au, np.float32)[None, :],
            sample_rate=a.sample_rate, n_fft=a.filter_length,
            hop_length=a.hop_length, win_length=a.win_length,
            n_mels=a.mel_channels, fmin=a.mel_fmin, fmax=a.mel_fmax,
        )
        mels.append(np.asarray(m)[0].astype(np.float16))
    return mels


def test_golden_trained_serving():
    if not GOLDEN.exists():
        pytest.skip("golden snapshot missing; run `python "
                    "tests/test_golden_trained.py regen`")
    golden = np.load(GOLDEN)
    mels = _synthesize_mels()
    assert len(mels) == len(golden.files)
    for i, m in enumerate(mels):
        g = golden[f"mel_{i}"]
        assert m.shape == g.shape, (
            f"utterance {i}: frame count {m.shape} != golden {g.shape} "
            "(duration predictions changed)"
        )
        diff = np.abs(m.astype(np.float32) - g.astype(np.float32))
        assert diff.max() < 0.05, (
            f"utterance {i}: max log-mel diff {diff.max():.4f} "
            f"(mean {diff.mean():.5f}) vs golden"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        mels = _synthesize_mels()
        np.savez_compressed(
            GOLDEN, **{f"mel_{i}": m for i, m in enumerate(mels)}
        )
        print(f"wrote {GOLDEN}: "
              + ", ".join(str(m.shape) for m in mels))
