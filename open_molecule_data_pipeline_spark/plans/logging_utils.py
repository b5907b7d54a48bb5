"""Structured event logging (reference parity, §2A X6).

Event-name + kwargs style logging (reference ``logging_utils.py:14-44``):
structlog when installed, a stdlib shim otherwise, so log lines keep the
same ``event key=value`` shape either way and observability parity holds.
"""

from __future__ import annotations

import logging


class _StdlibShim:
    def __init__(self, logger: logging.Logger):
        self._logger = logger

    def _fmt(self, event: str, kwargs: dict) -> str:
        parts = [event] + [f"{k}={v!r}" for k, v in sorted(kwargs.items())]
        return " ".join(parts)

    def info(self, event: str, **kwargs) -> None:
        self._logger.info(self._fmt(event, kwargs))

    def warning(self, event: str, **kwargs) -> None:
        self._logger.warning(self._fmt(event, kwargs))

    def error(self, event: str, **kwargs) -> None:
        self._logger.error(self._fmt(event, kwargs))

    def debug(self, event: str, **kwargs) -> None:
        self._logger.debug(self._fmt(event, kwargs))


def get_logger(name: str):
    try:  # pragma: no cover - structlog not in this image
        import structlog

        return structlog.get_logger(name)
    except ImportError:
        return _StdlibShim(logging.getLogger(name))
