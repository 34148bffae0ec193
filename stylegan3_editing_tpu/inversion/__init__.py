"""Inversion applications: PTI pivotal tuning (image + video variants)."""

from .pti import PTI, PTIOptions

__all__ = ["PTI", "PTIOptions"]
