"""Driver-interface contract tests for __graft_entry__.

The driver imports this module from a fresh interpreter whose jax backend is
the single tunneled TPU ("axon"); round 1 failed because dryrun_multichip
assumed the caller had already provisioned n devices, and round 3 failed
because the dryrun's compile load outgrew the driver's wall-clock budget
(MULTICHIP_r03.json: rc=124).  These tests exercise the exact public surface
the driver calls — dryrun_multichip(8) must self-provision its virtual mesh
in a subprocess AND finish inside the budget on this 1-vCPU host.
"""

import subprocess
import sys
import time

import pytest

# The driver kills the dryrun at ~10 min (round-3 evidence: rc=124 at 600 s).
# Assert a margin under that.  The persistent compile cache (.jax_cache/)
# makes warm runs ~1 min; a cold run is ~6-7 min of XLA CPU compile.
DRIVER_BUDGET_S = 570


def test_dryrun_multichip_8_within_driver_budget():
    """Default tier: the exact call the driver makes, time-bounded.

    Round 3 shipped a dryrun regression silently because the only test of
    this surface was slow-tier, 4-device, and unbounded.  This one runs in
    the default gate so the driver signal can never regress unnoticed.
    """
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    t0 = time.monotonic()
    dryrun_multichip(8)
    elapsed = time.monotonic() - t0
    assert elapsed < DRIVER_BUDGET_S, (
        f"dryrun_multichip(8) took {elapsed:.0f}s — over the {DRIVER_BUDGET_S}s "
        "driver budget; shrink the dryrun configs or check the compile cache"
    )


@pytest.mark.slow
def test_entry_compiles_single_device():
    code = (
        "import sys; sys.path.insert(0, '/root/repo'); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from __graft_entry__ import entry; "
        "fn, args = entry(); out = jax.jit(fn)(*args); "
        "import numpy as np; assert np.all(np.isfinite(out)); print('ok')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout
