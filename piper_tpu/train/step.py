"""GAN training step: generator + discriminator updates in one jit.

Parity: reference lightning.py:189-280 two-optimizer steps. Both
gradient passes use the same y_hat from the pre-update generator (the
reference smuggles it via self._y/_y_hat between optimizer closures —
here it is explicit dataflow, removing that ordering hazard flagged in
SURVEY.md §3.3).

Optimizers: AdamW lr 2e-4, betas (0.8, 0.99), eps 1e-9, weight decay
0.01 (torch default), ExponentialLR gamma=0.999875 per epoch
(lightning.py:312-332). Loss weights c_mel=45, c_kl=1
(lightning.py:68-70).

Designed to be pjit-sharded: see parallel/sharding.py for the mesh
layout (batch data-parallel, params replicated or model-sharded).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.vits.discriminator import mpd_apply
from ..ops.stft import mel_spectrogram, spec_to_mel
from . import losses as LS
from .forward import slice_segments, train_forward

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params_g: Params
    params_d: Params
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float = 2e-4,
    betas: Tuple[float, float] = (0.8, 0.99),
    eps: float = 1e-9,
    weight_decay: float = 0.01,
    lr_decay: float = 0.999875,
    steps_per_epoch: int = 1000,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=steps_per_epoch,
        decay_rate=lr_decay,
    )
    tx = optax.adamw(
        learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay,
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip(grad_clip), tx)
    return tx


def init_train_state(
    rng: jax.Array,
    cfg: ModelConfig,
    *,
    optimizer: Optional[optax.GradientTransformation] = None,
    steps_per_epoch: int = 1000,
) -> Tuple[TrainState, optax.GradientTransformation]:
    from ..models.vits.discriminator import init_mpd
    from ..models.vits.model import init_synthesizer_params

    r_g, r_d = jax.random.split(rng)
    params_g = init_synthesizer_params(r_g, cfg, training=True)
    params_d = init_mpd(r_d)
    if cfg.use_dur_disc:
        from ..models.vits.discriminator import init_dur_disc

        params_d = dict(params_d)
        params_d["dur_disc"] = init_dur_disc(
            jax.random.fold_in(r_d, 1), cfg.hidden_channels
        )
    tx = optimizer or make_optimizer(steps_per_epoch=steps_per_epoch)
    state = TrainState(
        params_g=params_g,
        params_d=params_d,
        opt_g=tx.init(params_g),
        opt_d=tx.init(params_d),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    c_mel: float = 45.0,
    c_kl: float = 1.0,
    dtype=jnp.float32,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One GAN step.

    batch: ids (B,T_x) i32, id_lengths (B,), spec (B,T_y,F) f32,
    spec_lengths (B,), audio (B,T_samples) f32, sid optional (B,).
    """
    a = cfg.audio
    seg_frames = cfg.segment_size // a.hop_length
    sid = batch.get("sid")

    mel_all = spec_to_mel(
        batch["spec"].astype(jnp.float32),
        sample_rate=a.sample_rate, n_fft=a.filter_length,
        n_mels=a.mel_channels, fmin=a.mel_fmin, fmax=a.mel_fmax,
    )

    # VITS2 annealed MAS noise: initial 0.01, decreased by 2e-6 every
    # step (zero after 5k steps — arXiv:2307.16430 §2.2), derived from
    # state.step so the jitted step needs no extra input.
    mas_noise_scale = None
    if cfg.mas_noise:
        mas_noise_scale = jnp.maximum(
            0.0, 0.01 - 2e-6 * state.step.astype(jnp.float32)
        )

    def gen_loss_fn(params_g):
        out = train_forward(
            params_g, cfg=cfg,
            ids=batch["ids"], id_lengths=batch["id_lengths"],
            spec=batch["spec"], spec_lengths=batch["spec_lengths"],
            sid=sid, rng=rng, dtype=dtype, mas_noise_scale=mas_noise_scale,
        )
        y_hat = out.y_hat.astype(jnp.float32)  # (B, seg_samples)
        y_mel = slice_segments(mel_all, out.ids_slice, seg_frames)
        y_hat_mel = mel_spectrogram(
            y_hat, sample_rate=a.sample_rate, n_fft=a.filter_length,
            hop_length=a.hop_length, win_length=a.win_length,
            n_mels=a.mel_channels, fmin=a.mel_fmin, fmax=a.mel_fmax,
        )
        y = slice_segments(
            batch["audio"].astype(jnp.float32)[..., None],
            out.ids_slice * a.hop_length,
            cfg.segment_size,
        )[..., 0]

        _, y_d_hat_g, fmap_r, fmap_g = mpd_apply(state.params_d, y, y_hat)

        loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * c_mel
        loss_kl = (
            LS.kl_loss(out.z_p, out.logs_q, out.m_p_exp, out.logs_p_exp, out.y_mask)
            * c_kl
        )
        loss_fm = LS.feature_loss(fmap_r, fmap_g)
        loss_gen, _ = LS.generator_loss(y_d_hat_g)
        loss_dur = out.loss_dur
        total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
        aux = {
            "loss_gen_all": total,
            "loss_gen": loss_gen,
            "loss_fm": loss_fm,
            "loss_mel": loss_mel,
            "loss_dur": loss_dur,
            "loss_kl": loss_kl,
            "y": y,
            "y_hat": y_hat,
        }
        if cfg.use_dur_disc:
            # VITS2: the duration predictor also fools a per-position
            # discriminator on (text hidden, log-duration) pairs.
            from ..models.vits.discriminator import dur_disc_apply

            dd_g = dur_disc_apply(
                state.params_d["dur_disc"], out.x_h, out.logw_hat, out.x_mask
            )
            denom = jnp.sum(out.x_mask)
            loss_dur_gen = (
                jnp.sum(jnp.square(1.0 - dd_g) * out.x_mask) / denom
            )
            total = total + loss_dur_gen
            aux["loss_gen_all"] = total
            aux["loss_dur_gen"] = loss_dur_gen
            aux["dd_in"] = (
                out.x_h,
                jax.lax.stop_gradient(out.logw_hat),
                out.logw_real,
                out.x_mask,
            )
        return total, aux

    (loss_g, aux), grads_g = jax.value_and_grad(gen_loss_fn, has_aux=True)(
        state.params_g
    )

    y = jax.lax.stop_gradient(aux.pop("y"))
    y_hat = jax.lax.stop_gradient(aux.pop("y_hat"))
    dd_in = aux.pop("dd_in", None)

    def disc_loss_fn(params_d):
        y_d_hat_r, y_d_hat_g, _, _ = mpd_apply(params_d, y, y_hat)
        loss_disc, _, _ = LS.discriminator_loss(y_d_hat_r, y_d_hat_g)
        if dd_in is not None:
            from ..models.vits.discriminator import dur_disc_apply

            x_h, logw_hat, logw_real, x_mask = dd_in
            dd_r = dur_disc_apply(params_d["dur_disc"], x_h, logw_real, x_mask)
            dd_f = dur_disc_apply(params_d["dur_disc"], x_h, logw_hat, x_mask)
            denom = jnp.sum(x_mask)
            loss_disc = loss_disc + (
                jnp.sum((jnp.square(1.0 - dd_r) + jnp.square(dd_f)) * x_mask)
                / denom
            )
        return loss_disc

    loss_d, grads_d = jax.value_and_grad(disc_loss_fn)(state.params_d)

    updates_g, opt_g = tx.update(grads_g, state.opt_g, state.params_g)
    params_g = optax.apply_updates(state.params_g, updates_g)
    updates_d, opt_d = tx.update(grads_d, state.opt_d, state.params_d)
    params_d = optax.apply_updates(state.params_d, updates_d)

    metrics = dict(aux)
    metrics["loss_disc_all"] = loss_d
    new_state = TrainState(
        params_g=params_g, params_d=params_d, opt_g=opt_g, opt_d=opt_d,
        step=state.step + 1,
    )
    return new_state, metrics
