"""Test bootstrap: force an 8-device virtual CPU backend before JAX loads.

Standard JAX fake-backend trick (SURVEY.md §4): all sharded tests run on a
virtual CPU mesh so the suite is hardware-independent; the driver separately
dry-runs the multi-chip path.
"""

import os

# MEATMODELER_TPU_TESTS=1 leaves the real accelerator visible for the
# @pytest.mark.tpu subset (run as: MEATMODELER_TPU_TESTS=1 pytest -m tpu).
# Everything else runs on the virtual CPU mesh, and pyproject's default
# addopts (-m 'not tpu') keep the tpu subset out of normal runs.
_TPU_MODE = os.environ.get("MEATMODELER_TPU_TESTS", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    # Force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU), but
    # the test suite must be hardware-independent and deterministic. The
    # installed jax build overrides the env-var default with "axon,cpu", so
    # the config is updated explicitly after import as well.
    os.environ["JAX_PLATFORMS"] = "cpu"
    # f64 available for oracle comparisons (solvers themselves run f32 on TPU).
    os.environ["JAX_ENABLE_X64"] = "1"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache for the CPU test backend: the suite's
# wall-clock is dominated by recompiling the same programs every run on the
# single throttled host core (~40 min cold). Cached, repeat runs reuse them.
#
# KEYED PER MACHINE: XLA's CPU AOT loader does not key cache entries on the
# host's CPU features — an entry compiled on a machine with (say) AMX/
# prefer-no-gather loads on a host without them and can die with SIGILL
# mid-suite (observed: cpu_aot_loader.cc "Target machine feature ... is not
# supported on the host machine", then a fatal crash). Hashing the cpuinfo
# flags into the directory name gives each machine class its own cache.
def _machine_tag() -> str:
    import hashlib

    # Hash flags AND model name: XLA keys some target features (e.g.
    # +prefer-no-gather, a microcode-erratum mitigation) on the CPU MODEL,
    # not on cpuinfo feature flags — two hosts with identical flags can still
    # disagree on the AOT target (observed: cpu_aot_loader "+prefer-no-gather
    # is not supported on the host machine" from a flags-only-keyed cache).
    try:
        keys = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    keys.append(line.strip())
                    if len(keys) == 2:
                        break
        if keys:
            return hashlib.sha256("\n".join(sorted(set(keys))).encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:8]


if not _TPU_MODE:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(__file__), "..", ".cache", f"jax-cpu-{_machine_tag()}"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # CPU needs these two explicitly; without them nothing is ever written.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


# Bound in-process XLA/LLVM state: after ~45 min of suite accumulation the
# CPU backend segfaulted NATIVELY (inside backend_compile_and_load) while
# compiling the vmapped shard_map BA program — reproducibly at the same
# test in two full runs, while the same test passes in a fresh process and
# in any shorter subset. Dropping the jit caches between test modules keeps
# the resident-executable population small; the persistent disk cache makes
# the re-loads cheap.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
