"""Progress-callback contract.

The reference threads `prog(pct, status)` through every pipeline stage
(sam2_masker.py:65,86,140,149; diffuerase.py:26,33,51,59,69) and the GUI
passes a richer kwargs form (videovanish.py:1508-1517). That callback
signature is API surface — kept identical here. Cooperative cancellation
follows the reference's Worker protocol (videovanish.py:110-132): jobs
poll `is_canceled()` between stages/chunks.
"""
from __future__ import annotations

from typing import Callable, Optional, Protocol


class ProgressFn(Protocol):
    def __call__(self, pct: float, status: str = "", **kw) -> None: ...


def null_prog(pct: float, status: str = "", **kw) -> None:
    return None


def scale_prog(prog: Optional[Callable], lo: float, hi: float,
               prefix: str = "") -> Callable:
    """Remap a sub-stage's 0-100 progress into [lo, hi] of the parent's."""
    if prog is None:
        return null_prog

    def scaled(pct: float, status: str = "", **kw) -> None:
        p = lo + (hi - lo) * (max(0.0, min(100.0, float(pct))) / 100.0)
        prog(p, (prefix + status) if prefix else status, **kw)

    return scaled


class CancelledError(RuntimeError):
    """Raised when a job observes its cancel flag between stages."""


def check_cancel(is_canceled: Optional[Callable[[], bool]]) -> None:
    if is_canceled is not None and is_canceled():
        raise CancelledError("job canceled")
