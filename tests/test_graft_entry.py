"""Driver-gate regression tests for ``__graft_entry__.dryrun_multichip``.

Round-2 failure mode (VERDICT r2, weak #1): ``jax.device_count()`` ran
BEFORE the CPU platform was forced, initializing the axon TPU-tunnel
backend, whose libtpu can be version-skewed vs the terminal — the poisoned
backend then surfaced inside ``device_put`` as FAILED_PRECONDITION. The
contract under test: the dryrun must complete on a virtual CPU mesh without
EVER initializing any non-CPU backend.

Run as a subprocess so the check sees the real import-time environment
(sitecustomize registers the axon plugin there), not the pytest-conftest
one. The subprocess runs a 2-device dryrun to keep this cheap; the full
8-device 3-family pass is the driver's own MULTICHIP gate.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import __graft_entry__

__graft_entry__.dryrun_multichip(2)

# Inspect which backends were actually initialized. _backends holds only
# platforms that were instantiated this process — axon appearing here means
# the TPU tunnel was touched (the round-2 failure mode).
import jax
from jax._src import xla_bridge

initialized = set(xla_bridge._backends)
assert initialized, "no backends initialized?"
non_cpu = initialized - {{"cpu"}}
assert not non_cpu, f"dryrun initialized non-CPU backends: {{non_cpu}}"
assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
print("OK", sorted(initialized))
"""


def test_dryrun_never_initializes_tpu_backend():
    # Reproduce the driver environment: conftest exports JAX_PLATFORMS=cpu
    # into this process, which the subprocess would inherit — strip it so
    # the dryrun itself must do the platform forcing.
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=600, cwd=str(REPO), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout, proc.stdout
