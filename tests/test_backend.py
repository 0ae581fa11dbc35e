"""lvt_tpu.backend: TPU detection must key on device descriptors, not the
platform registration name (a tunneled PJRT plugin can register the chip
under a transport-specific backend name while devices are real TPUs)."""

import jax

from lvt_tpu import backend


def test_cpu_is_not_tpu():
    backend.is_tpu_backend.cache_clear()
    assert backend.is_tpu_backend() is False


def test_detects_tpu_from_device_kind(monkeypatch):
    class FakeDev:
        platform = "axon"
        device_kind = "TPU v5e"
        platform_version = "tpu v5 lite"

    backend.is_tpu_backend.cache_clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    assert backend.is_tpu_backend() is True
    backend.is_tpu_backend.cache_clear()


def test_detects_tpu_from_backend_name(monkeypatch):
    backend.is_tpu_backend.cache_clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert backend.is_tpu_backend() is True
    backend.is_tpu_backend.cache_clear()


def test_broken_backend_is_not_tpu(monkeypatch):
    def boom():
        raise RuntimeError("backend init failed")

    backend.is_tpu_backend.cache_clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(jax, "devices", boom)
    assert backend.is_tpu_backend() is False
    backend.is_tpu_backend.cache_clear()
