"""Import the reference (torch) VITS as a numeric oracle for parity tests.

The reference tree at /root/reference is read-only public content used
strictly as a behavioral oracle: we instantiate its torch modules with
random weights, run them in eval mode, and assert our JAX
implementation matches. The Cython monotonic_align extension is stubbed
(inference never calls it; our training stack has its own MAS
implementation tested against a pure-numpy Viterbi).
"""

import sys
import types

import numpy as np
import torch

REF_PY = "/root/reference/src/python"


def _install_mas_stub():
    """models.py imports piper_train.vits.monotonic_align at module
    scope; provide a numpy Viterbi stand-in so import works without the
    Cython build."""
    name = "piper_train.vits.monotonic_align"
    if name in sys.modules:
        return

    mod = types.ModuleType(name)

    def maximum_path(neg_cent, mask):
        neg = neg_cent.detach().cpu().numpy().astype(np.float32)
        msk = mask.detach().cpu().numpy().astype(bool)
        out = np.zeros_like(neg)
        for b in range(neg.shape[0]):
            t_y = int(msk[b].any(axis=1).sum())
            t_x = int(msk[b].any(axis=0).sum())
            out[b, :t_y, :t_x] = _viterbi(neg[b, :t_y, :t_x])
        return torch.from_numpy(out).to(neg_cent.device, neg_cent.dtype)

    mod.maximum_path = maximum_path
    sys.modules[name] = mod


def _viterbi(value):
    """Best monotonic path DP (same recurrence as the reference's
    core.pyx, reimplemented independently in numpy)."""
    t_y, t_x = value.shape
    v = np.full((t_y, t_x), -np.inf, np.float32)
    for y in range(t_y):
        for x in range(max(0, t_x - t_y + y), min(t_x, y + 1)):
            prev_same = v[y - 1, x] if y > 0 else (-np.inf if x > 0 else 0.0)
            prev_diag = v[y - 1, x - 1] if (y > 0 and x > 0) else (
                0.0 if (y == 0 and x == 0) else -np.inf
            )
            base = max(prev_same, prev_diag) if y > 0 else (
                0.0 if x == 0 else -np.inf
            )
            v[y, x] = value[y, x] + base
    path = np.zeros((t_y, t_x), np.float32)
    x = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[y, x] = 1.0
        if y > 0 and (x == y or (x > 0 and v[y - 1, x] < v[y - 1, x - 1])):
            x -= 1
    return path


def load_reference_vits():
    """Return the reference piper_train.vits package (torch modules)."""
    if REF_PY not in sys.path:
        sys.path.insert(0, REF_PY)
    # piper_train/__init__.py may pull heavy deps; import the vits
    # subpackage directly.
    import piper_train.vits  # noqa: F401

    _install_mas_stub()
    from piper_train.vits import attentions, commons, models, modules, transforms

    return types.SimpleNamespace(
        attentions=attentions,
        commons=commons,
        models=models,
        modules=modules,
        transforms=transforms,
    )


def make_ref_synthesizer(cfg, seed=0):
    """Instantiate the reference SynthesizerTrn from our ModelConfig."""
    ref = load_reference_vits()
    torch.manual_seed(seed)
    model = ref.models.SynthesizerTrn(
        n_vocab=cfg.num_symbols,
        spec_channels=cfg.spec_channels,
        segment_size=cfg.segment_size // cfg.audio.hop_length,
        inter_channels=cfg.inter_channels,
        hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        kernel_size=cfg.kernel_size,
        p_dropout=cfg.p_dropout,
        resblock=cfg.resblock,
        resblock_kernel_sizes=cfg.resblock_kernel_sizes,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        n_speakers=cfg.num_speakers,
        gin_channels=cfg.gin_channels,
        use_sdp=cfg.use_sdp,
    )
    model.eval()
    return model
