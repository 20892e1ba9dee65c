"""Source adapters (SURVEY.md §2.A).

``openmeteo``: the reference's wire format — struct-of-arrays JSON
(reference server.py:74, 258) — parsed into the engine's tidy long
table with pure built-ins.  ``resilience``: the reference's
retry/backoff and rate-limit envelope (server.py:68-93, 108) as
injectable, unit-testable policies for live-source wrappers.
"""

from .openmeteo import (  # noqa: F401
    OPENMETEO_HOURLY_SCHEMA,
    parse_openmeteo_hourly,
    to_openmeteo_json,
)
from .resilience import RateLimiter, RetryPolicy  # noqa: F401
