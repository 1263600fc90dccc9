"""Driver-entry bootstrap tests (VERDICT r2 Weak #1).

The driver calls ``dryrun_multichip(8)`` from an env where
``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count=8`` are
set BUT ``PALLAS_AXON_POOL_IPS`` is also set, so the axon sitecustomize
registers the 1-chip TPU plugin underneath and a fresh jax init sees one
TPU device, not 8 CPUs. Rounds 1-2 failed because the guard sniffed the
env instead of reality. The fix: the parent path ALWAYS re-execs a
scrubbed child; these tests pin the scrub and the unconditional re-exec
without ever importing jax in-process.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __graft_entry__ as ge


def test_scrubbed_env_from_driver_like_env():
    # the exact round-2 failure env: reads "cpu/8" but the axon pool var
    # is set, so a fresh jax init would actually produce a 1-chip TPU
    base = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "10.0.0.1",
        "PYTHONPATH": "/root/.axon_site",
        "PATH": "/usr/bin",
    }
    env = ge._scrubbed_child_env(8, base)
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    # PYTHONPATH appended, never overwritten (axon site dir must survive)
    assert env["PYTHONPATH"].split(os.pathsep)[0] == "/root/.axon_site"
    assert HERE in env["PYTHONPATH"].split(os.pathsep)
    assert base["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"


def test_scrubbed_env_replaces_stale_device_count():
    base = {"XLA_FLAGS": "--xla_foo --xla_force_host_platform_device_count=2"}
    env = ge._scrubbed_child_env(8, base)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=2" not in env["XLA_FLAGS"]
    assert "--xla_foo" in env["XLA_FLAGS"]


def test_dryrun_always_reexecs(monkeypatch):
    """The parent path must re-exec unconditionally — even when the env
    looks like it already has a virtual CPU mesh (the round-2 trap)."""
    calls = []

    def fake_run(argv, env=None, cwd=None, **kw):
        calls.append((argv, env))

        class R:
            returncode = 0
            stdout = "dryrun ok\n"
            stderr = ""

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    # env that fooled the round-2 guard
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")

    ge.dryrun_multichip(8)

    assert len(calls) == 1
    argv, env = calls[0]
    assert argv[0] == sys.executable
    assert argv[1].endswith("__graft_entry__.py")
    assert argv[2:] == ["--dryrun", "8"]
    assert "PALLAS_AXON_POOL_IPS" not in env


def test_dryrun_raises_on_child_failure(monkeypatch):
    def fake_run(argv, env=None, cwd=None, **kw):
        class R:
            returncode = 3
            stdout = ""
            stderr = "boom"

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="rc=3"):
        ge.dryrun_multichip(8)
