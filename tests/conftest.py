"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere — this is the TPU-world analog of
a fake backend for multi-chip tests (SURVEY.md §4), and keeps unit-test
compiles fast and hermetic.
"""
import os
import sys

# NOTE: the environment may preimport jax with a TPU backend forced via
# JAX_PLATFORMS; override (not setdefault) and also flip the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# fast-compile: the suite tests SEMANTICS on XLA:CPU, not CPU speed.
# Backend opt level 0 cuts the multi-minute LLVM optimization of the
# giant interpret-mode Pallas programs, and sidesteps the round-4
# mid-suite segfault inside backend_compile_and_load on the largest
# wavefront programs (LLVM-pass crash on huge functions; see
# /tmp/pytest_r4b.log forensics — cache was already off).
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NO persistent compile cache for the suite: the XLA:CPU cache write
# segfaults inside `executable.serialize()` on large CPU-mesh
# executables (VERDICT r3 #7; reproduced round 4 at 70% of a full run
# — the round-3 zlib rerouting treated the wrong frame, the fault is
# CPU AOT serialization itself, and its loader warns SIGILL-class
# machine-feature mismatches on readback).  CPU recompiles cost the
# suite a few minutes; a nondeterministic mid-suite segfault costs the
# whole run.  The cache stays on for tunneled-TPU entry points only
# (tools/cache.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The residual mid-suite segfault (r4b: test_render lane tiling; r5:
# test_photon estimate_corners — always inside backend_compile_and_load
# on one of the largest programs, always fine in isolation) fits stack
# exhaustion during LLVM's deep recursion over huge kernel bodies:
# XLA:CPU compiles on the CALLING thread, and the main thread's stack
# cannot reliably grow past mappings placed near it (a runtime
# RLIMIT_STACK raise did not help).  Fresh threads DO honor an explicit
# large stack, so every test body runs on a 512 MB-stack worker thread
# — compiles inherit it, and the crash cannot recur wherever the
# biggest compile happens to land in suite order.
import threading  # noqa: E402

import pytest  # noqa: E402


@pytest.hookimpl(tryfirst=True)
def pytest_pyfunc_call(pyfuncitem):
    testfunction = pyfuncitem.obj
    kwargs = {name: pyfuncitem.funcargs[name]
              for name in pyfuncitem._fixtureinfo.argnames}
    result = {}

    def run():
        try:
            testfunction(**kwargs)
        except BaseException as e:   # noqa: BLE001 — re-raised below
            result["exc"] = e

    old = threading.stack_size(512 * 1024 * 1024)
    try:
        t = threading.Thread(target=run, name=f"test:{pyfuncitem.name}")
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if "exc" in result:
        raise result["exc"]
    return True

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
