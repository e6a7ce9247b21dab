from .train import run_trainer
from .test import run_tester

__all__ = ["run_trainer", "run_tester"]
