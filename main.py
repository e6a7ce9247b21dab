#!/usr/bin/env python
"""CLI entry point — same override surface as the reference's hydra CLI.

    python main.py model.attention.type=mha data.sampling=sync train.epochs=30

Composes config groups (attention_based_tbn_tpu/config/defaults), creates the
hydra-style run dir, and dispatches training and/or evaluation
(reference main.py:17-46).
"""

import sys

import numpy as np


def _apply_platform_overrides(overrides):
    """First-class platform selection, applied BEFORE jax initializes.

    ``tpu.platform=cpu`` (+ optional ``tpu.host_devices=8``) forces the CPU
    backend with N virtual devices — needed because some PJRT plugins (the
    tunneled TPU here) ignore a JAX_PLATFORMS environment override, so
    env-only selection silently lands on the accelerator."""
    import os

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


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    config_dir = None
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("--config-dir", "-cd"):
            config_dir = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    _apply_platform_overrides(overrides)

    from attention_based_tbn_tpu.config import load_config, make_run_dir
    from attention_based_tbn_tpu.utils.logging import setup_log
    from attention_based_tbn_tpu.utils.misc import get_modality

    cfg = load_config(overrides=overrides, config_dir=config_dir)

    cache_dir = cfg.get_path("tpu.compile_cache", "") or ""
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    np.random.seed(int(cfg.data.manual_seed))

    modality = get_modality(cfg)
    run_dir = make_run_dir(cfg)
    cfg.run_dir = run_dir
    logger, writer = setup_log(modality, run_dir)

    logger.info("Initializing the pipeline...")
    logger.info(cfg.pretty())
    logger.info(f"Modality: {modality}")
    logger.info(f"Run dir: {run_dir}")
    logger.info("-" * 58)

    try:
        if cfg.train.enable:
            logger.info("Training the model.")
            from attention_based_tbn_tpu.tools.train import run_trainer

            run_trainer(cfg, logger, modality, writer)

        if cfg.test.enable:
            logger.info("Evaluating the model.")
            from attention_based_tbn_tpu.tools.test import run_tester

            run_tester(cfg, logger, modality)
    except Exception as exc:  # noqa: BLE001 — mirror reference main.py:32-41
        logger.exception(exc)
        raise


if __name__ == "__main__":
    main()
