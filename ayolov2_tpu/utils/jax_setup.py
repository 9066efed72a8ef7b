"""JAX bootstrap: persistent compilation cache + platform helpers.

This environment's compiles are expensive (single-threaded XLA); the
persistent cache makes every second run of a given shape instant. Call
:func:`setup` early from CLIs, benchmarks, and test conftest.
"""

from __future__ import annotations

import os


def _machine_tag() -> str:
    """Short hash of the host CPU feature set.

    The sandbox VM can land on hosts with different AVX feature sets between
    boots; XLA:CPU AOT cache entries compiled for a richer ISA SIGILL on a
    poorer one (cpu_aot_loader warns about exactly this). Keying the cache
    dir by the feature set keeps entries host-compatible. TPU entries are
    tied to the same dir but recompile cheaply per host-era."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "default"


def setup(cache_dir: str = "") -> None:
    import jax

    # Honor an explicit JAX_PLATFORMS from the environment: the ambient
    # sitecustomize pins the tunneled TPU backend and the env var alone is
    # not enough in subprocesses (the config must be updated before the
    # backend initializes) — same belt-and-braces as tests/conftest.py.
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat and "tpu" not in plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    # NEVER persist XLA:CPU executables: deserializing a CPU entry loads an
    # AOT result whose compile-machine string embeds LLVM *tune* flags
    # (+prefer-no-gather/+prefer-no-scatter) that host feature detection
    # never reports — cpu_aot_loader then warns "could lead to SIGILL" even
    # for an entry compiled seconds earlier on the SAME host (reproduced
    # with a fresh cache). No cpuinfo-based dir keying can make that
    # mismatch a miss, so CPU runs (tests, the driver's multichip dryrun)
    # simply skip the persistent cache; TPU compiles — the expensive ones
    # through the tunnel — keep it.
    resolved = plat or ("cpu" if jax.config.jax_platforms == "cpu" else "")
    if "cpu" in (resolved or "").lower():
        return

    cache = cache_dir or os.environ.get(
        "AYOLO_JAX_CACHE", f"/root/.cache/jax_comp_cache_{_machine_tag()}"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags — cache is best-effort
        pass
