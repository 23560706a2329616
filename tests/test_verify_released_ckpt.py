"""scripts/verify_released_ckpt.py --dry-run must pass end-to-end: the
released-checkpoint parity harness exercised with a synthetic tiny
checkpoint (reference code as oracle), so the BASELINE.md parity clause is
one command away when xfm_1b3.th is available."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_verify_released_ckpt_dry_run():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "verify_released_ckpt.py"),
         "--dry-run"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY OK" in proc.stdout, proc.stdout