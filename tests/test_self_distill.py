"""examples/self_distill.py executes end to end (round-1 review item
2): dataset build -> GAN training -> export -> served-voice mel-L1
eval. Tiny scale on CPU; the real convergence run's numbers live in
docs/CONVERGENCE.md."""

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "examples"))


@pytest.mark.slow
def test_self_distill_end_to_end(tmp_path, capsys):
    import self_distill

    self_distill.main([
        "--out", str(tmp_path),
        "--quality", "x-low",
        "--steps", "4",
        "--batch-size", "2",
        "--max-utterances", "10",
        "--seed", "3",
    ])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert summary["steps"] == 4
    assert summary["loss_mel_last"] == summary["loss_mel_last"]  # not NaN
    assert "serve_mel_l1_trained" in summary
    assert summary["serve_mel_l1_trained"] > 0
    assert (tmp_path / "ckpt" / "metrics.jsonl").exists()
    assert list((tmp_path / "ckpt").glob("voice_*.npz"))
