"""Test env: CPU backend with 8 virtual devices so mesh/sharding tests
run without TPUs (SURVEY.md §4 test strategy).

Note: the session's sitecustomize pre-imports jax with the TPU (axon)
platform, so the env var alone is not enough — we must update the
already-imported jax config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("OMP_NUM_THREADS", "4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
