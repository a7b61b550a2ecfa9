"""Backend-pin normalization (utils/platform.py): container generations
disagree on the tunnel plugin's platform name ('axon' vs 'tpu'), and a
stale JAX_PLATFORMS=axon env pin aborts every backend init on the newer
ones.  Entry points normalize the pin; benchmarks additionally refuse to
fall back to CPU silently."""

import os

import pytest

from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                        require_accelerator)


def test_stale_axon_pin_rewritten_to_auto(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    normalize_jax_platforms()
    assert os.environ["JAX_PLATFORMS"] == ""
    monkeypatch.setenv("JAX_PLATFORMS", " AXON ")  # case/space tolerant
    normalize_jax_platforms()
    assert os.environ["JAX_PLATFORMS"] == ""


def test_other_pins_left_alone(monkeypatch):
    for v in ("cpu", "tpu", "cpu,tpu", "", "axon,cpu"):
        monkeypatch.setenv("JAX_PLATFORMS", v)
        normalize_jax_platforms()
        assert os.environ["JAX_PLATFORMS"] == v, v
    monkeypatch.delenv("JAX_PLATFORMS")
    normalize_jax_platforms()
    assert "JAX_PLATFORMS" not in os.environ


def test_require_accelerator_raises_on_cpu_backend():
    # the test suite forces the CPU backend (conftest), which is exactly
    # the silent-fallback condition benchmarks must refuse
    with pytest.raises(RuntimeError, match="CPU backend"):
        require_accelerator()
