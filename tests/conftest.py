"""Test configuration: force JAX onto the host CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (the same trick the
reference uses with software Vulkan in CI)."""

import os
import sys

# Must run before jax imports anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon site hook (sitecustomize) may have already registered the TPU
# platform and forced jax_platforms before this conftest ran; force CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persist compiled executables across test processes: the fused pipeline
# takes minutes to compile on CPU and is identical between runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/forma_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Frees compiled executables after each test module.

    A full-suite run accumulates every compiled pipeline variant in one
    process; past ~90% of the suite, XLA:CPU's executable (de)serialization
    segfaults (observed twice at the same test, in
    `put_executable_and_time`/`get_executable_and_time`; the same tests pass
    in a fresh process).  Bounding the in-process executable count avoids
    the crash; the persistent disk cache keeps re-JITs cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


def pytest_sessionfinish(session, exitstatus):
    """Writes the golden-comparison HTML report (the analog of the reference's
    self-updating report.html, `e2e-tests/tests/test_env.rs:315-421`)."""
    try:
        from report import GLOBAL_REPORT

        if GLOBAL_REPORT.entries:
            path = GLOBAL_REPORT.write()
            print(f"\ngolden report: {path} ({len(GLOBAL_REPORT.entries)} entries)")
    except Exception as e:  # never fail the run over reporting
        print(f"\ngolden report failed: {e}")
