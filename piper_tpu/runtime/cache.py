"""Machine-keyed persistent XLA compilation cache.

The persistent cache stores AOT-compiled executables. XLA:CPU
executables are compiled FOR the compiling host's CPU features; loading
them on a host with different features fails (cpu_aot_loader:
"Machine type used for XLA:CPU compilation doesn't match the machine
type for execution ... could lead to execution errors such as SIGILL")
— best case a wasted load + recompile per entry, worst case SIGILL.
TPU executables are likewise keyed to the compiler/runtime version.

So the cache directory is keyed by a host fingerprint: entries written
on one machine are never even *offered* to a different one. The
fingerprint covers the CPU feature set (/proc/cpuinfo flags), the
machine architecture, and the jax/jaxlib versions (serialization format
compatibility). Reference counterpart: none — the reference's
onnxruntime sessions have no persistent compile cache; this layer
exists because bucketed serving compiles a fixed shape set whose reuse
makes cold starts cheap (see runtime/voice.py module docstring).
"""

from __future__ import annotations

import hashlib
import logging
import os
import platform

_LOGGER = logging.getLogger(__name__)


def host_fingerprint() -> str:
    """Short stable id for (CPU features, arch, jax version).

    Two hosts share a fingerprint only if an AOT executable compiled on
    one is loadable on the other: same architecture, same CPU feature
    flags (XLA:CPU codegen targets the compile host's features), same
    jax/jaxlib (executable serialization format).
    """
    parts = [platform.machine(), platform.system()]
    try:
        import jax

        parts.append(jax.__version__)
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:  # pragma: no cover - jax is a hard dep in practice
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    # one logical CPU is enough; flags are per-package
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor())
    digest = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    return digest


def cache_dir(base: str | None = None) -> str:
    """Machine-keyed cache directory under `base`.

    base resolution: explicit arg > $PIPER_TPU_CACHE > ~/.cache/piper_tpu.
    The returned path is base/<fingerprint> so a shared base (home dir
    mounted across machines, a repo checkout moved between hosts) never
    mixes incompatible executables.
    """
    if base is None:
        base = os.environ.get("PIPER_TPU_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "piper_tpu"
        )
    return os.path.join(base, host_fingerprint())


def clean_cpu_aot_flags() -> None:
    """Cap XLA:CPU codegen at AVX2 so persistent-cache entries reload
    without spurious cpu_aot_loader feature-mismatch errors.

    XLA:CPU compiling at native ISA appends tuning pseudo-features
    (+prefer-no-gather, +prefer-no-scatter) to the executable's
    feature list, but the AOT loader's host probe reports only real
    CPUID flags — so every reload, even on the very host that compiled
    the entry, logs a feature-mismatch error (measured here: the
    reload still succeeds and halves startup, but the log screams
    SIGILL). Capping at AVX2 keeps the compiled feature list to real
    flags only; reloads are then silent.

    Must run BEFORE jax initializes its backends (XLA_FLAGS is parsed
    once); no-op if the user already set xla_cpu_max_isa. Intended for
    CPU-platform processes that use the persistent cache (the multichip
    dryrun, CPU bench runs) — TPU executables go through a different
    loader without this failure mode.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" in flags:
        return
    os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()


def enable_persistent_cache(base: str | None = None) -> None:
    """Point jax at the machine-keyed cache dir (idempotent; respects a
    cache dir the user already configured on jax.config)."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", cache_dir(base))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - cache is best-effort
        _LOGGER.debug("could not enable compilation cache", exc_info=True)
