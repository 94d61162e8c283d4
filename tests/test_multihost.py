"""Multi-host wiring tests (--multihost CLI flag, parallel/mesh.init_multihost).

Real multi-host needs several processes; these tests verify the wiring —
flag plumbing, argument forwarding into jax.distributed.initialize, and
that the documented single-process no-arg TPU-pod path degrades cleanly —
without a pod (VERDICT r1 item 8)."""

import jax
import pytest

from difusco_tpu.parallel import mesh as mesh_mod


class TestInitMultihost:
    def test_forwards_explicit_args(self, monkeypatch):
        seen = {}

        def fake_init(**kw):
            seen.update(kw)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        monkeypatch.setattr(jax, "process_index", lambda: 3)
        pid = mesh_mod.init_multihost(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=3
        )
        assert pid == 3
        assert seen == {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 3,
        }

    def test_auto_detect_passes_no_args(self, monkeypatch):
        """TPU pods auto-detect coordinator/process info; no kwargs then."""
        seen = {"called": False}

        def fake_init(**kw):
            seen["called"] = True
            assert kw == {}

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        mesh_mod.init_multihost()
        assert seen["called"]


class TestCLIMultihostFlag:
    def test_cli_invokes_init_before_run(self, monkeypatch, tmp_path):
        """--multihost must call init_multihost with the CLI args before
        datasets/mesh are built."""
        from difusco_tpu import cli

        calls = []
        monkeypatch.setattr(
            mesh_mod, "init_multihost",
            lambda coordinator_address=None, num_processes=None,
            process_id=None: calls.append(
                (coordinator_address, num_processes, process_id)) or 0,
        )
        monkeypatch.setattr(cli, "run", lambda cfg: calls.append("run") or {})
        cli.main([
            "--task", "tsp", "--storage_path", str(tmp_path),
            "--multihost", "--coordinator_address", "h0:9999",
            "--num_processes", "2", "--process_id", "0",
        ])
        assert calls[0] == ("h0:9999", 2, 0)
        assert calls[1] == "run"
