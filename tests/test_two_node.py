"""Two-node cluster dress rehearsal (VERDICT r4 "Next" #9).

Runs `scripts/two_node_rehearsal.py` in a subprocess: a REAL two-raylet
Ray cluster (head + worker over localhost), the crawl's scale path
forced, full oracle-equality + kill-and-resume checks across inter-node
object transfer.

GATED behind VV8RAY_TWO_NODE=1 because the rehearsal calls `ray stop
--force`, which would kill the suite's session-scoped Ray instance —
run it standalone via `make two-node`.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(os.environ.get("VV8RAY_TWO_NODE") != "1",
                    reason="standalone only (make two-node): ray stop "
                           "would kill the suite's Ray session")
def test_two_node_rehearsal():
    out = subprocess.run(
        [sys.executable, "/root/repo/scripts/two_node_rehearsal.py"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "TWO-NODE OK" in out.stdout
