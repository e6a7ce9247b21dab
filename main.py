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
    """See utils/platform.py — shared with the standalone tool CLIs."""
    from attention_based_tbn_tpu.utils.platform import (
        apply_platform_overrides,
    )

    apply_platform_overrides(overrides)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    config_dir = None
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("--config-dir", "-cd"):
            if i + 1 >= len(argv):
                raise SystemExit(f"error: missing value for {argv[i]}")
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
        # Host-keyed subdir: a cache that survives a host change must not
        # serve another machine's XLA:CPU AOT code (SIGILL, not a miss).
        from attention_based_tbn_tpu.utils.platform import (
            enable_compile_cache,
        )

        enable_compile_cache(cache_dir)

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
