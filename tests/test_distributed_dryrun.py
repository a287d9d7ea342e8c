"""The N>=2-process jax.distributed path as a regression test.

Wraps examples/distributed_dryrun.py (coordinator bring-up, global mesh
over two processes' devices, process_local_batch assembly, one sharded PPO
train step, cross-process loss agreement) in pytest so the multi-host code
path is CI-checked, not just an example (VERDICT r3 #7).  The reference's
counterpart capability is multi-node roslaunch (SURVEY §2.1).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_dryrun():
    env = dict(os.environ, PYTHONPATH=REPO)
    # the workers force their own cpu platform + device count; scrub any
    # conftest-injected flags so each subprocess starts clean
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "distributed_dryrun.py"),
         "--procs", "2", "--port", str(_free_port())],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=850)
    assert out.returncode == 0, (out.stdout[-3000:], out.stderr[-3000:])
    assert "distributed dryrun ok: 2 processes" in out.stdout
    assert out.stdout.count("agrees on 2 processes") == 2
