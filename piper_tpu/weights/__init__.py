"""Weight loading: reference checkpoints/ONNX voices -> JAX pytrees."""

from .torch_loader import (  # noqa: F401
    load_torch_checkpoint,
    params_from_state_dict,
)
