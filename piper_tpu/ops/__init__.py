"""TPU-first primitive ops: NWC convolutions, norms, splines, masking."""

from .nn import (  # noqa: F401
    conv1d,
    conv1d_transpose,
    layer_norm,
    leaky_relu,
    sequence_mask,
)
from .spline import rational_quadratic_spline  # noqa: F401
from .duration import duration_to_frame_indices, expand_by_duration  # noqa: F401
