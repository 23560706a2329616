"""On-real-TPU test harness.

`tests/conftest.py` pins the whole session to the 8-device virtual CPU mesh,
so real-chip kernel behavior (MXU numerics, Pallas lowering, dispatch
thresholds) is never exercised by `pytest tests/`. This directory runs on
actual TPU hardware: `python -m pytest tests_tpu/ -q` under the normal
(TPU) environment. Every test skips cleanly when no TPU is attached.

Keep this suite SMALL — each new jitted shape costs a real compile through
the chip tunnel (~20-60 s).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.fixture(scope="session")
def tpu():
    if not _tpu_available():
        pytest.skip("no TPU attached")
    return jax.devices()[0]
