"""Test harness: 8 virtual CPU devices so every sharding/collective test runs
without a TPU pod (SURVEY.md §4.3 strategy)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell env pins a TPU platform
# Tasks default to bf16 compute (the product path); on the CPU test backend
# bf16 is emulated and slow, and parity tolerances assume f32 — force f32
# here. Precision-specific tests override via explicit `compute_dtype` keys.
os.environ.setdefault("XFM_COMPUTE_DTYPE", "float32")
# No network egress in CI: skip huggingface-hub retry storms (5 retries x
# several files ≈ minutes per tokenizer miss) and go straight to cache or
# the SimpleTokenizer fallback.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent XLA compilation cache: the e2e task tests re-compile identical
# tiny jit programs every run (the bulk of the 30-min suite wall time); cache
# executables across runs. Loads print a benign "machine feature mismatch"
# E-line from the AOT loader (prefer-no-scatter/-gather are XLA tuning
# pseudo-features, not host ISA features). XFM_NO_JIT_CACHE=1 opts out.
if os.environ.get("XFM_NO_JIT_CACHE", "0") != "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/xfm_tpu_pytest_jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# This jax build's TPU plugin ignores the JAX_PLATFORMS env var; the config
# route does work (must run before backend init).
jax.config.update("jax_platforms", "cpu")

# This build's XLA CPU backend runs f32 matmuls at reduced (bf16-class)
# precision by default; parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# jax 0.9 does not auto-read JAX_COMPILATION_CACHE_DIR from the env — engage
# the cache via config (in-process only; the subprocess remat-regression test
# therefore always runs a real SPMD compile).
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def eight_devices():
    assert len(jax.devices()) == 8
    return jax.devices()
