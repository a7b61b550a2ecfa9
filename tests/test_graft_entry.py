"""Driver entry-point checks.

The driver compile-checks entry() single-chip and runs dryrun_multichip(N)
with a virtual N-device CPU mesh (VERDICT r1 item 1: the dryrun must
bootstrap that mesh itself when the process is pinned to the axon TPU).
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, example_args = ge.entry()
    dist, idx = jax.jit(fn)(*example_args)
    assert dist.shape == (8, 10)
    assert idx.shape == (8, 10)


def test_dryrun_inprocess_on_cpu_mesh():
    # conftest pinned cpu + 8 virtual devices, so this must run in-process.
    assert ge._cpu_mesh_ready(8)
    ge.dryrun_multichip(2)


def test_dryrun_reexecs_when_mesh_unavailable(monkeypatch):
    # Simulate the driver's axon-pinned process: the bootstrap must re-exec
    # a CPU child rather than touching the current (single-tenant) backend.
    monkeypatch.setattr(ge, "_cpu_mesh_ready", lambda n: False)
    monkeypatch.delenv(ge._CHILD_ENV, raising=False)
    called = {}

    def fake_reexec(n):
        called["n"] = n

    monkeypatch.setattr(ge, "_reexec_dryrun", fake_reexec)
    ge.dryrun_multichip(8)
    assert called["n"] == 8
