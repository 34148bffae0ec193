"""General runtime utilities.

Parity: reference dnnlib/util.py — EasyDict (:40), stdout/file tee Logger
(:56), format_time (:139), and config-by-classname reflection
`construct_class_by_name` (:301), which the SetGAN stack uses to build
networks from config trees (setgan/training_loop.py:218).
"""

from __future__ import annotations

import importlib
import sys
from typing import Any, Optional


class EasyDict(dict):
    """dict with attribute access (config-tree node)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


class Logger:
    """Tee stdout (and optionally stderr) to a log file."""

    def __init__(self, file_name: Optional[str] = None, file_mode: str = "w",
                 should_flush: bool = True):
        self.file = open(file_name, file_mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        if sys.stdout is self:
            sys.stdout = self.stdout
        if self.file is not None:
            self.file.close()
            self.file = None


def format_time(seconds: float) -> str:
    """Seconds → 'h m s' / 'd h m' human string."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 60 * 60:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 24 * 60 * 60:
        return f"{s // (60 * 60)}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // (24 * 60 * 60)}d {(s // (60 * 60)) % 24:02d}h {(s // 60) % 60:02d}m"


def get_obj_by_name(name: str) -> Any:
    """'pkg.module.Class' → the object."""
    module_name, _, obj_name = name.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, obj_name)


def construct_class_by_name(*args, class_name: Optional[str] = None, **kwargs):
    """Instantiate a class given its fully-qualified name + kwargs."""
    assert class_name is not None
    return get_obj_by_name(class_name)(*args, **kwargs)
