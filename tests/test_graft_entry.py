"""The driver entry points must be hermetic.

dryrun_multichip re-execs its body in a scrubbed subprocess: the axon
sitecustomize imports jax (and registers the TPU tunnel plugin) at
interpreter startup whenever PALLAS_AXON_POOL_IPS is set, so an
in-process guard can never win in the driver's environment — with a
dead relay the backend init would hang until the driver timeout
(MULTICHIP_r03 rc=124).  These tests pin the scrub contract without
paying for the full dry run.
"""

import os
import subprocess
import sys

import pytest


def _load_entry_module():
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry_under_test", os.path.join(repo, "__graft_entry__.py"))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_dryrun_wrapper_scrubs_env(monkeypatch):
    mod = _load_entry_module()
    captured = {}

    def fake_run(cmd, env=None, cwd=None, timeout=None):
        captured.update(cmd=cmd, env=env, cwd=cwd, timeout=timeout)

        class P:
            returncode = 0
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    # simulate the driver's poisoned environment
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site:/some/other")
    monkeypatch.delenv("_GENPC_DRYRUN_CHILD", raising=False)

    mod.dryrun_multichip(8)

    env = captured["env"]
    assert env["_GENPC_DRYRUN_CHILD"] == "1"
    assert env["JAX_PLATFORMS"] == "cpu"
    for var in ("PALLAS_AXON_POOL_IPS", "AXON_POOL_SVC_OVERRIDE",
                "AXON_LOOPBACK_RELAY", "PALLAS_AXON_REMOTE_COMPILE"):
        assert var not in env, var
    assert ".axon_site" not in env["PYTHONPATH"]
    assert "/some/other" in env["PYTHONPATH"]
    # repo root must stay importable in the child
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert repo in env["PYTHONPATH"].split(os.pathsep)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "JAX_COMPILATION_CACHE_DIR" in env
    assert captured["cmd"][0] == sys.executable
    assert captured["cmd"][1].endswith("__graft_entry__.py")
    assert captured["cmd"][2] == "8"
    assert captured["timeout"] is not None


def test_dryrun_wrapper_raises_on_child_failure(monkeypatch):
    mod = _load_entry_module()

    def fake_run(cmd, env=None, cwd=None, timeout=None):
        class P:
            returncode = 3
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("_GENPC_DRYRUN_CHILD", raising=False)
    with pytest.raises(RuntimeError, match="rc=3"):
        mod.dryrun_multichip(4)


def test_dryrun_wrapper_times_out(monkeypatch):
    mod = _load_entry_module()

    def fake_run(cmd, env=None, cwd=None, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("_GENPC_DRYRUN_CHILD", raising=False)
    with pytest.raises(RuntimeError, match="exceeded"):
        mod.dryrun_multichip(4)
