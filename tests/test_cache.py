"""Machine-keyed persistent-cache layer (piper_tpu/runtime/cache.py).

Round-5 fix for the round-4 failure mode: XLA:CPU AOT executables
compiled on one host fail to load on another (cpu_aot_loader CPU
feature mismatch, SIGILL risk). The cache dir must therefore be keyed
by a host fingerprint so incompatible entries are never offered."""

import os

from piper_tpu.runtime import cache as C


def test_fingerprint_stable_and_short():
    fp1 = C.host_fingerprint()
    fp2 = C.host_fingerprint()
    assert fp1 == fp2
    assert len(fp1) == 12
    assert all(c in "0123456789abcdef" for c in fp1)


def test_cache_dir_appends_fingerprint(tmp_path):
    d = C.cache_dir(str(tmp_path))
    assert d == os.path.join(str(tmp_path), C.host_fingerprint())


def test_cache_dir_env_base(tmp_path, monkeypatch):
    monkeypatch.setenv("PIPER_TPU_CACHE", str(tmp_path / "envbase"))
    d = C.cache_dir()
    assert d.startswith(str(tmp_path / "envbase"))
    assert d.endswith(C.host_fingerprint())


def test_cache_dir_default_base(monkeypatch):
    monkeypatch.delenv("PIPER_TPU_CACHE", raising=False)
    d = C.cache_dir()
    assert d == os.path.join(
        os.path.expanduser("~"), ".cache", "piper_tpu", C.host_fingerprint()
    )


def test_fingerprint_covers_cpu_flags():
    """The exact round-4 failure: same arch + jax version, different
    CPU feature flags, must produce different fingerprints. Simulated
    by diffing the hash input the same way host_fingerprint builds it."""
    import hashlib
    import platform

    def fp(flags):
        parts = [platform.machine(), platform.system()]
        import jax
        import jaxlib

        parts += [jax.__version__, getattr(jaxlib, "__version__", "")]
        parts.append(flags)
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]

    assert fp("avx2 sse4_2") != fp("amx-fp16 avx2 sse4_2")


def test_enable_persistent_cache_respects_existing(tmp_path):
    import jax

    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "user"))
        C.enable_persistent_cache(str(tmp_path / "other"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "user")
        jax.config.update("jax_compilation_cache_dir", None)
        C.enable_persistent_cache(str(tmp_path / "other"))
        assert jax.config.jax_compilation_cache_dir == C.cache_dir(
            str(tmp_path / "other")
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
