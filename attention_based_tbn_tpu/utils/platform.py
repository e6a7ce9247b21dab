"""First-class platform selection, applied BEFORE jax initializes.

``tpu.platform=cpu`` (+ optional ``tpu.host_devices=8``) forces the CPU
backend with N virtual devices — needed because some PJRT plugins (the
tunneled TPU here) ignore a ``JAX_PLATFORMS`` environment override, so
env-only selection silently lands on the accelerator. Every CLI that may
run before/without ``main.py`` (e.g. ``tools/export.py``) must call this
on its raw override list before touching jax.
"""

import hashlib
import os
import platform as _platform


def host_fingerprint() -> str:
    """Short hash of this host's CPU identity (machine, model, ISA flags).

    XLA:CPU's persistent compilation cache stores AOT machine code for the
    build host's exact feature set; loading an entry compiled on a different
    host only WARNS ("Target machine feature +prefer-no-scatter is not
    supported...") before executing it — observed as a fatal SIGILL/abort
    rather than a cache miss. Keying cache directories by this fingerprint
    makes stale cross-host entries unreachable instead of fatal. The model
    name is included because identical flag lines can still differ in
    model-dependent LLVM tuning.
    """
    tag = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    tag += line
                if line.startswith(("flags", "Features")):
                    break
    except OSError:
        tag += _platform.processor()
    return hashlib.md5(tag.encode()).hexdigest()[:10]


def enable_compile_cache(cache_dir, min_compile_secs=5.0):
    """Point jax's persistent compilation cache at a host-keyed subdir.

    ``cache_dir`` is the user-facing root (e.g. ``tpu.compile_cache=...``);
    entries land in ``<cache_dir>/<host_fingerprint()>`` so a cache
    directory that survives a host change (shared filesystem, /tmp image,
    repo checkout) cannot serve another machine's XLA:CPU AOT code.
    """
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(cache_dir, host_fingerprint()),
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )


def apply_platform_overrides(overrides):
    platform = None
    host_devices = None
    for item in overrides:
        if item.startswith("tpu.platform="):
            platform = item.split("=", 1)[1]
        elif item.startswith("tpu.host_devices="):
            host_devices = int(item.split("=", 1)[1])
    if platform is None and host_devices is None:
        return
    if host_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={host_devices}"
        ).strip()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
