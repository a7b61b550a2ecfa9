"""Installable-package parity (reference Makefile:30-63 fpm deb target):
`make deb` must produce a valid .deb whose payload launches the CLI."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("dpkg-deb") is None,
                    reason="dpkg-deb not available")
def test_build_deb_and_launch(tmp_path):
    out = subprocess.run(
        ["bash", os.path.join(REPO, "packaging", "build_deb.sh")],
        capture_output=True, text=True, check=True,
        env={**os.environ, "VERSION": "0.0.0test"})
    deb = out.stdout.strip().splitlines()[-1]
    assert deb.endswith(".deb") and os.path.exists(deb)
    try:
        listing = subprocess.run(["dpkg-deb", "-c", deb],
                                 capture_output=True, text=True,
                                 check=True).stdout
        for needle in ("./usr/bin/syzgy-tpu",
                       "./etc/syzgy.conf",
                       "./lib/systemd/system/syzgy-tpu.service",
                       "syzgydb_tpu/tools/cli.py"):
            assert needle in listing, needle
        # unpack the payload and import the packaged tree with --help
        subprocess.run(["dpkg-deb", "-x", deb, str(tmp_path)], check=True)
        env = {**os.environ,
               "PYTHONPATH": str(tmp_path / "usr/lib/syzgy-tpu"),
               "JAX_PLATFORMS": "cpu"}
        r = subprocess.run(
            [sys.executable, "-m", "syzgydb_tpu.tools.cli", "--help"],
            capture_output=True, text=True, env=env, timeout=120)
        assert r.returncode == 0, r.stderr
        assert "serve" in r.stdout.lower()
    finally:
        os.remove(deb)
