"""Operator B6/B7 parity evidence: a task killed mid-superstep recovers via
Spark retry, composing with Checkpointer resume (reference fault story:
worker failure detection + job restart, master/master.go:431-445 — Spark
subsumes detection via heartbeats; this test proves the RECOVERY half)."""

import json
import os
import subprocess
import sys


def test_task_failure_retries_and_composes_with_checkpoint(tmp_path):
    script = os.path.join(os.path.dirname(__file__), "fault_inject_script.py")
    marker = tmp_path / "injected.log"
    marker.touch()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [sys.executable, script, str(tmp_path / "ck"), str(marker)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr[-3000:]}"
    rep = json.loads(out[-1])
    assert rep["match"] and rep["resumed_match"] and rep["converged"]
    assert rep["n_injected_failures"] >= 1, "the fault never fired"
