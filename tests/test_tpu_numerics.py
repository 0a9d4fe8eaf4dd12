"""Pytest wrapper for the REAL-TPU numerics acceptance (opt-in).

The suite proper runs on CPU float64 (conftest), where the MXU's
bf16-truncating default precision cannot occur — interpreter-mode coverage
of the whole-solve kernels is therefore documented as NOT covering on-chip
numerics.  This wrapper subprocess-runs ``tpu_numerics_main.py`` on the
real chip when opted in:

    CP_TPU_POOL_IPS="$PALLAS_AXON_POOL_IPS" PALLAS_AXON_POOL_IPS= \
        JAX_PLATFORMS=cpu CP_TPU_TESTS=1 python -m pytest \
        tests/test_tpu_numerics.py -q

(the parent must skip the chip claim — PALLAS_AXON_POOL_IPS= — so the
child can take it; CP_TPU_POOL_IPS escrows the original value).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CP_TPU_TESTS") != "1",
    reason="on-chip test: set CP_TPU_TESTS=1 (see module docstring)")


def test_whole_solve_kernels_on_chip():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    pool = env.get("CP_TPU_POOL_IPS") or env.get("PALLAS_AXON_POOL_IPS")
    if not pool:
        pytest.skip("no TPU pool address available (CP_TPU_POOL_IPS unset "
                    "and PALLAS_AXON_POOL_IPS empty)")
    env["PALLAS_AXON_POOL_IPS"] = pool
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tpu_numerics_main.py")
    r = subprocess.run([sys.executable, script], env=env,
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        raise AssertionError(
            f"on-chip numerics checks failed (rc={r.returncode})\n"
            f"--- stdout ---\n{r.stdout}\n--- stderr ---\n{r.stderr[-3000:]}")
