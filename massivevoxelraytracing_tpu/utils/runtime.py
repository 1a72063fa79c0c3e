"""Process-level runtime setup: persistent XLA compilation cache + timers.

The axon-tunneled TPU backend compiles large graphs slowly (minutes); the
persistent cache makes every app/bench invocation after the first fast.
Plays the role the reference's JIT-compile cache of `Shader` kernels plays
(hipUtil.hpp:112-157) at the XLA level.
"""

from __future__ import annotations

import os
import time

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def setup(cache_dir: str | None = None) -> None:
    # MVRT_PLATFORM=cpu: run any app/script on the host CPU (smoke tests,
    # tunnel outages). Must go through jax.config -- this environment pins
    # JAX_PLATFORMS=axon via sitecustomize, clobbering the env var alone
    # (same dance as tests/conftest.py and __graft_entry__.dryrun_multichip).
    plat = os.environ.get("MVRT_PLATFORM")
    if plat:
        os.environ["JAX_PLATFORM_NAME"] = plat
        os.environ["JAX_PLATFORMS"] = plat

    import jax

    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    elif os.environ.get("MVRT_CPU_FALLBACK"):
        # opt-in (bench.py): if the pinned TPU backend cannot initialize
        # (the tunnel goes down for hours at a time), fall back to host
        # CPU instead of crashing -- callers must LABEL their output as a
        # CPU run so a fallback measurement is never mistaken for chip
        # perf. The probe MUST run in a subprocess with a timeout: a dead
        # tunnel makes jax.devices() HANG indefinitely (it does not
        # raise), and once in-process backend init has started it cannot
        # be redirected to CPU.
        import subprocess
        import sys

        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                capture_output=True, timeout=90,
            ).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            sys.stderr.write("[runtime] TPU probe failed (tunnel down?); "
                             "falling back to CPU\n")
            jax.config.update("jax_platforms", "cpu")

    cache = cache_dir or os.environ.get("MVRT_JAX_CACHE", _DEFAULT_CACHE)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache EVERYTHING: on the axon backend even trivial eager ops take
    # ~0.4s to compile remotely, and they fall under the default 1s
    # persistence threshold -- so every process would pay them again.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


import contextlib


@contextlib.contextmanager
def profile(trace_dir: str | None):
    """jax.profiler trace wrapper (the reference ships --generate-line-info
    kernels for external profilers, PathTracer.hpp:56-66; ours emits a
    TensorBoard/XProf trace)."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Per-phase wall timers with the reference's stats-line spirit
    (RTCamp.cpp:195: '[frame N] res() total() / update / render')."""

    def __init__(self):
        self.t0 = time.time()
        self.marks: dict[str, float] = {}

    def lap(self, name: str, block_on=None) -> float:
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        now = time.time()
        dt = now - self.t0
        self.marks[name] = self.marks.get(name, 0.0) + dt
        self.t0 = now
        return dt
