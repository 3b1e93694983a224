"""Queue stage-completion verification contract (VERDICT r3 #5).

`scripts/queue.sh --selftest` exercises run_stage's -V artifact checks in a
throwaway directory: stale done-markers re-run, rc=0 without the declared
artifact is not marked done, and marker+artifact skips. The round-3 incident
this guards against: hand-touched markers made the queue silently skip the
two headline workload chains.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queue_selftest():
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "queue.sh"), "--selftest"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "queue selftest OK" in out.stdout
