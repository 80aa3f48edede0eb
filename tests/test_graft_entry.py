"""Regression tests for the driver entry points in __graft_entry__.py.

The driver runs ``dryrun_multichip(n)`` from a process whose default XLA
backend may already be initialized — on the bench rig, a TPU plugin that can
be *broken* (libtpu version skew made every eager op raise in rounds 1-2).
``dryrun_multichip`` must therefore never dispatch on the pre-existing
backend: it re-executes its body in a child process whose environment pins
``JAX_PLATFORMS=cpu`` before ``import jax``.

These tests simulate the driver condition: a live backend + pinned
``jax_platforms`` (the rig's sitecustomize behavior, see conftest.py) before
the call.  Under pytest the conftest has already initialized the CPU backend,
so ``_jax_backend_is_live()`` is True and the subprocess path is exercised
for real.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_backend_live_detection():
    # conftest.py has initialized the CPU backend already.
    jax.devices()
    assert graft._jax_backend_is_live()


def test_child_env_is_isolated():
    env = graft._child_env(4)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
    # exactly one count flag, ours
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    assert env["TDR_DRYRUN_INPROCESS"] == "1"
    # the TPU-plugin sitecustomize must not leak into the child
    assert "axon_site" not in env.get("PYTHONPATH", "")
    # the repo itself must be importable in the child
    assert REPO in env["PYTHONPATH"].split(os.pathsep)


def test_child_env_strips_existing_count_flag(monkeypatch):
    monkeypatch.setenv(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=2 --xla_cpu_foo=1")
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site:/other/path")
    env = graft._child_env(8)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=2" not in env["XLA_FLAGS"]
    assert "--xla_cpu_foo=1" in env["XLA_FLAGS"]
    assert "/other/path" in env["PYTHONPATH"].split(os.pathsep)
    assert "/root/.axon_site" not in env["PYTHONPATH"].split(os.pathsep)


def test_child_failure_propagates(monkeypatch):
    # Force the child to die instantly; the parent must raise with the tail.
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run([sys.executable, "-c",
                         "import sys; print('boom'); sys.exit(3)"],
                        **{k: v for k, v in kw.items() if k != "env"})

    monkeypatch.setattr(subprocess, "run", fake_run)
    # Ensure we take the subprocess path even though this test process could
    # in principle run in-process.
    monkeypatch.delenv("TDR_DRYRUN_INPROCESS", raising=False)
    with pytest.raises(RuntimeError, match="boom"):
        graft.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_with_live_backend():
    """The actual driver scenario: backend live, platforms pinned, call it.

    This exercises the full subprocess round trip (child compiles the tiny
    flagship train step over an 8-device CPU mesh, FSDP and dp x sp
    included).
    """
    jax.devices()  # backend definitely live
    assert graft._jax_backend_is_live()
    graft.dryrun_multichip(8)
