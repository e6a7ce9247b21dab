"""First-class platform selection, applied BEFORE jax initializes.

``tpu.platform=cpu`` (+ optional ``tpu.host_devices=8``) forces the CPU
backend with N virtual devices — needed because some PJRT plugins (the
tunneled TPU here) ignore a ``JAX_PLATFORMS`` environment override, so
env-only selection silently lands on the accelerator. Every CLI that may
run before/without ``main.py`` (e.g. ``tools/export.py``) must call this
on its raw override list before touching jax.
"""

import os


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
