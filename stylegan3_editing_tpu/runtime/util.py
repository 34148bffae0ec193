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


def open_url(url: str, cache_dir: Optional[str] = None, num_attempts: int = 10,
             verbose: bool = True):
    """Download (with retries) and cache a URL; returns an open file object.

    Parity: dnnlib/util.py:396 `open_url` — the asset fetcher behind every
    pretrained-weight download in the reference.
    """
    import hashlib
    import io
    import os
    import time
    import urllib.request

    assert num_attempts >= 1
    cache_dir = cache_dir or os.path.join(
        os.environ.get("SG3TPU_CACHE", os.path.expanduser("~/.cache/sg3tpu")),
        "downloads")
    os.makedirs(cache_dir, exist_ok=True)
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    cached = [f for f in os.listdir(cache_dir) if f.startswith(url_md5)]
    if cached:
        return open(os.path.join(cache_dir, cached[0]), "rb")

    data = None
    for attempt in range(num_attempts):
        try:
            with urllib.request.urlopen(url, timeout=60) as resp:
                data = resp.read()
            break
        except Exception as e:
            if attempt == num_attempts - 1:
                raise
            if verbose:
                print(f"download failed ({e}); retrying...")
            time.sleep(min(2 ** attempt, 30))
    name = url.split("/")[-1] or "download"
    path = os.path.join(cache_dir, f"{url_md5}_{name}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return open(path, "rb")


def get_obj_by_name(name: str) -> Any:
    """'pkg.module.Class' → the object."""
    module_name, _, obj_name = name.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, obj_name)


def construct_class_by_name(*args, class_name: Optional[str] = None, **kwargs):
    """Instantiate a class given its fully-qualified name + kwargs."""
    assert class_name is not None
    return get_obj_by_name(class_name)(*args, **kwargs)


class TimingUtil:
    """Per-phase wall-clock accumulator (parity: setgan/utils.py:4-76)."""

    def __init__(self):
        self._totals: dict = {}
        self._counts: dict = {}
        self._starts: dict = {}

    def start(self, name: str) -> None:
        import time
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        import time
        dt = time.perf_counter() - self._starts.pop(name)
        self._totals[name] = self._totals.get(name, 0.0) + dt
        self._counts[name] = self._counts.get(name, 0) + 1
        return dt

    def __call__(self, name: str):
        import contextlib

        @contextlib.contextmanager
        def scope():
            self.start(name)
            try:
                yield
            finally:
                self.stop(name)

        return scope()

    def mean(self, name: str) -> float:
        return self._totals.get(name, 0.0) / max(self._counts.get(name, 0), 1)

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self._counts[k],
                    "mean_s": round(self.mean(k), 4)}
                for k, v in self._totals.items()}
