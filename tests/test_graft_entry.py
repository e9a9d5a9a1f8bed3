"""The driver contract: __graft_entry__.dryrun_multichip must self-provision.

Round-1 failure mode (MULTICHIP_r01.json): the driver calls
``dryrun_multichip(8)`` in a process whose default backend exposes ONE real
TPU chip, and the mesh build raised ``dp*mp != 1 devices``.  These tests pin
both provisioning paths:

* fresh process, backend not yet initialized -> in-process jax.config flip
  to an 8-device virtual CPU backend;
* backend already initialized with too few devices -> subprocess re-exec
  under JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_extra=None) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    env.update(env_extra or {})
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_dryrun_fresh_process_self_provisions():
    proc = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_falls_back_to_subprocess_when_backend_taken():
    # Pre-initialize a 1-device backend before calling the dryrun — the
    # shape of the round-1 driver failure.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in proc.stdout
