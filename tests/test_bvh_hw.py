"""Hardware (real-TPU) BVH kernel == dense scan, bitwise (VERDICT r3 #9).

Skipped unless APTD_TPU_TESTS=1: the normal test env forces the CPU
platform (conftest.py), so the check runs in a subprocess that claims the
real chip via tools/hw_bvh_check.py.  Last known hardware pass is recorded
in PARITY.md.
"""
import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.skipif(os.environ.get("APTD_TPU_TESTS") != "1",
                    reason="real-TPU test; set APTD_TPU_TESTS=1")
@pytest.mark.parametrize("stage", ["blob", "statue", "blob_binned",
                                   "statue_binned"])
def test_kernel_bitwise_on_hardware(stage):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)        # let the axon TPU register
    proc = subprocess.run(
        [sys.executable, "-u", str(REPO / "tools" / "hw_bvh_check.py"),
         stage], capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["ok"], res
    assert res["hits"] > 0
