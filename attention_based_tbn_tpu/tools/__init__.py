from .train import run_trainer
from .test import run_tester

__all__ = [
    "run_trainer",
    "run_tester",
    "initialize",
    "create_dataset",
    "get_info",
    "visualize",
]


def __getattr__(name):
    # vis tooling pulls in matplotlib; load lazily like the reference's
    # notebook-only path (reference core/tools/__init__.py exports it too)
    if name in ("initialize", "create_dataset", "get_info", "visualize"):
        from . import vis

        return getattr(vis, name)
    raise AttributeError(name)
