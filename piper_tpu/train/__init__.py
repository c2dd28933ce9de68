"""Training stack: losses, GAN train step, optimizers, data pipeline."""

from .losses import (  # noqa: F401
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from .step import TrainState, init_train_state, train_step  # noqa: F401
