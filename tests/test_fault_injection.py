"""Fault-injection exactly-once parity — the RainStormWithFail analogue
(VERDICT r04 item #3).

The reference's demo kills 2 op-worker machines 1.5 s into a running
RainStorm job and the grader checks the output still matches a clean run
(main.go:223-243, rainstorm/server.go:553-572 KillRandom; recovery via
the WAL replay the exactly-once design doc describes). Spark's failure
domain for the same guarantee is TASK retry: tests/fault_injection_job.py
runs a streaming job whose Python-operator stage fails on EVERY first
task attempt (strictly more hostile than killing 2 of N workers once)
under ``local[4, 2]`` (spark.task.maxFailures=2) and proves both sink
shapes stay exactly-once:

- transactional parquet APPEND sink (manifest commit log): no lost and
  no duplicated records vs batch ground truth;
- stateful running count + idempotent foreachBatch overwrite: final
  state equals the batch aggregate.

Checkpoint-recovery-across-RESTART (the WAL-replay axis) is covered
separately in tests/test_streaming.py (multi-stateful recovery).

Runs in a subprocess because the shared test session is local[32] with
maxFailures=1 — the injected first-attempt failure would be fatal there.
"""

from __future__ import annotations

import pytest
import json
import os
import subprocess
import sys


@pytest.mark.slow
def test_injected_task_failures_stay_exactly_once(tmp_path):
    job = os.path.join(os.path.dirname(__file__), "fault_injection_job.py")
    proc = subprocess.run(
        [sys.executable, job, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_injected_failures"] > 0, "injection never fired"
    assert res["n_truth"] > 0
    assert res["n_sink"] == res["n_truth"], res
    assert res["stateless_exact"], res
    assert res["stateful_exact"], res
