"""Backend-pin normalization for containerized TPU environments.

The TPU tunnel's PJRT plugin registered its platform as "axon" in older
container generations and as "tpu" in newer ones, while the container
environment pins JAX_PLATFORMS=axon either way (the pin exists to prevent
a silent CPU fallback when the tunnel's register() fails).  On a newer
container that stale pin aborts EVERY jax backend init with "Backend
'axon' is not in the list of known backends: ['cpu', 'tpu']".

Entry points (bench.py, __graft_entry__, the CLI) call
normalize_jax_platforms() BEFORE jax initializes any backend: a pin that
names only the legacy platform is rewritten to auto-choose, which picks
the tunnel TPU under either name.  The no-silent-CPU property the pin
provided is preserved where it matters by require_accelerator().
"""

from __future__ import annotations

import os

__all__ = ["normalize_jax_platforms", "require_accelerator"]


def normalize_jax_platforms() -> None:
    """Rewrite a stale JAX_PLATFORMS=axon pin to auto-choose.

    Must run before jax initializes backends (i.e. before jax.devices()
    or the first trace).  jax latches the env var into jax.config at
    import time, so when jax is already imported (any syzgydb_tpu import
    pulls it in) the live config is rewritten too.  No-op for any other
    value, including "cpu" (tests) and unset.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "axon":
        os.environ["JAX_PLATFORMS"] = ""
    import sys

    jax = sys.modules.get("jax")
    if jax is not None and \
            (jax.config.jax_platforms or "").strip().lower() == "axon":
        jax.config.update("jax_platforms", None)


def require_accelerator() -> None:
    """Raise if jax resolved to the host CPU backend.

    Benchmarks and TPU probes call this right after backend init so a
    failed tunnel surfaces as a hard error instead of silently producing
    CPU numbers (the failure mode the original env pin guarded against).
    """
    import jax

    if jax.default_backend() == "cpu":
        raise RuntimeError(
            "jax fell back to the host CPU backend — the TPU tunnel is "
            "unavailable or failed to register. Refusing to run a TPU "
            "benchmark path on the host; check the axon tunnel / "
            "JAX_PLATFORMS.")
