"""Run logging: python logger + TensorBoard writer into the run directory.

Mirrors reference core/utils/log.py (hydra-managed format
``%(levelname)s : %(asctime)s : %(message)s``, console + file) and
core/utils/plot.py (scalar plotting + HTML config dump).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

_FORMAT = "%(levelname)s : %(asctime)s : %(message)s"


def setup_log(modality: List[str], run_dir: Optional[str] = None):
    """(logger, writer). The writer is a tensorboardX SummaryWriter into the
    run dir, or None when tensorboardX is unavailable."""
    name = "tbn_" + "_".join(modality)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.propagate = False  # avoid duplicate lines via the root logger

    formatter = logging.Formatter(_FORMAT)
    console = logging.StreamHandler()
    console.setFormatter(formatter)
    logger.addHandler(console)

    writer = None
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)
        file_handler = logging.FileHandler(os.path.join(run_dir, f"{name}.log"))
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir=run_dir)
        except ImportError:
            writer = None

    return logger, writer


class Plotter:
    """Scalar plotting + config dump (reference core/utils/plot.py)."""

    def __init__(self, writer):
        self.writer = writer

    def plot_scalar(self, scalar, epoch: int, out_name: str) -> None:
        if self.writer is not None and scalar is not None:
            self.writer.add_scalar(out_name, scalar, epoch)

    def add_config(self, cfg) -> None:
        if self.writer is not None:
            pretty = cfg.pretty().replace("\n", "  \n")
            self.writer.add_text("config", pretty, 0)
