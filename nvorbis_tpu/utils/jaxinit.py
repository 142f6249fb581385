"""One-time jax configuration applied at first device-plane use.

Enables the persistent compilation cache so a library user's second
process never re-pays XLA compiles (measured: an uncached cold decode of
a 6.5 s fixture spent ~85 s compiling through the remote-compile relay;
warm-process decode of the same file is sub-second).  bench.py sets the
same cache explicitly; this covers plain ``VorbisReader`` users.

Respects an existing configuration: an explicit
``JAX_COMPILATION_CACHE_DIR`` or a ``jax_compilation_cache_dir`` already
set by the embedding application wins.  ``NVT_NO_COMPILE_CACHE=1``
disables entirely.
"""

import os

_done = False


def machine_cache_dir(base: str) -> str:
    """``base`` suffixed by a machine-feature fingerprint.

    XLA:CPU persists AOT-compiled executables specialized to the host's
    CPU features; loading them on a host with different features warns
    ("could lead to execution errors such as SIGILL") and risks exactly
    that.  Keying the directory by ``machine + cpu flags`` makes every
    host class its own cache (observed: a virtualized fleet whose nodes
    restore from shared snapshots but expose different AVX levels)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                # x86 "flags", arm64 "Features"
                if ln.startswith(("flags", "Features")):
                    feats = ln.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{feats}"
    return os.path.join(
        base, "m-" + hashlib.sha1(key.encode()).hexdigest()[:10]
    )


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    # same trigger point (first device-plane use), same spirit (one-time
    # process-level setup a library user should not have to know about):
    # recycle host pages instead of re-faulting them (see utils/hostmem.py)
    from nvorbis_tpu.utils.hostmem import enable_page_recycling

    enable_page_recycling()
    if os.environ.get("NVT_NO_COMPILE_CACHE", "") not in ("", "0"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return
    except AttributeError:
        return
    path = machine_cache_dir(os.path.join(
        os.path.expanduser("~"), ".cache", "nvorbis_tpu", "jax_cache"
    ))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never block a decode on it
