"""Retry/backoff and rate-limit policies — the reference's fetch
resilience envelope, made injectable and unit-testable.

Reference semantics reproduced exactly (server.py:68-93):

- up to 3 attempts with exponential backoff 1 s → 2 s → 4 s;
- only timeouts and network errors are retried;
- HTTP status errors (4xx/5xx) fail fast — the remote answered;
- after retries are exhausted, one final un-retried fallback attempt.

And the geocoder throttle (server.py:108): ≥ 1.1 s between calls.

In the engine these wrap *driver-side* control-plane calls (geocode
refresh, API ingest into a landing zone).  Executor-side fault
tolerance is Spark's own task retry + stage re-execution — never
re-implemented here.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import TypeVar

T = TypeVar("T")


class HttpStatusError(RuntimeError):
    """Remote answered with an error status — NOT retryable
    (server.py:88-89: status errors propagate immediately)."""

    def __init__(self, status: int, reason: str = "", body: str = ""):
        super().__init__(f"HTTP {status}: {reason}")
        self.status = status
        #: parsed ``reason`` field of the remote's JSON error body
        #: (server.py:268-270), "" when the body had none
        self.reason = reason
        #: raw response text (server.py:267), "" when unavailable
        self.body = body


class TransientFetchError(RuntimeError):
    """Timeout / connection failure — retryable (server.py:80-87)."""


@dataclass
class RetryPolicy:
    """3-attempt exponential backoff + single fallback attempt
    (server.py:32: MAX_RETRIES=3; server.py:69-93)."""

    max_retries: int = 3
    base_delay: float = 1.0
    sleep: Callable[[float], None] = time.sleep
    attempts_made: int = field(default=0, init=False)

    def call(self, fn: Callable[[], T]) -> T:
        self.attempts_made = 0
        last: Exception | None = None
        for attempt in range(self.max_retries):
            self.attempts_made += 1
            try:
                return fn()
            except HttpStatusError:
                raise  # fail fast — the server answered (server.py:88-89)
            except TransientFetchError as exc:
                last = exc
                if attempt < self.max_retries - 1:
                    self.sleep(self.base_delay * (2**attempt))  # 1s, 2s, 4s
        # final fallback attempt, un-retried (server.py:91-93)
        self.attempts_made += 1
        try:
            return fn()
        except Exception as exc:
            raise exc from last


@dataclass
class RateLimiter:
    """Minimum spacing between calls (server.py:108:
    AsyncRateLimiter(min_delay_seconds=1.1))."""

    min_delay: float = 1.1
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep
    _last: float | None = field(default=None, init=False)

    def wait(self) -> float:
        """Block until a call is permitted; returns seconds slept."""
        now = self.clock()
        slept = 0.0
        if self._last is not None:
            remaining = self.min_delay - (now - self._last)
            if remaining > 0:
                self.sleep(remaining)
                slept = remaining
                now = now + remaining
        self._last = now
        return slept
