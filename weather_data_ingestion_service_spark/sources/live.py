"""Live HTTP fetch path — the reference's ``fetch_json`` envelope
(server.py:57-93) wired behind the existing resilience policies.

The sandbox has no network, so everything here is structured for
injection and disabled by default: set ``WDS_LIVE_FETCH=1`` to enable
the real transport.  The transport is a plain callable
``(url, params) -> (status_code, body_text)`` so tests (and offline
runs) swap in a fake without monkeypatching sockets; the default
transport is stdlib ``urllib`` (no third-party HTTP client in the
container).

Semantics reproduced from the reference:

- retry/backoff/fallback exactly per ``resilience.RetryPolicy``
  (server.py:68-93): 3 attempts, 1 s → 2 s → 4 s, HTTP status errors
  fail fast, one final un-retried fallback attempt;
- HTTP error responses surface as ``HttpStatusError`` carrying the
  parsed ``reason`` field of the JSON error body and the raw body
  text (server.py:263-277 consumes exactly these);
- timeouts / connection failures surface as ``TransientFetchError``
  (retryable, server.py:80-87);
- the public endpoints are the reference's own
  (server.py:27-28): forecast, archive, geocoding.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

from .resilience import HttpStatusError, RateLimiter, RetryPolicy, TransientFetchError

#: public API bases (reference server.py:27-28)
FORECAST_API_BASE = "https://api.open-meteo.com/v1/forecast"
ARCHIVE_API_BASE = "https://archive-api.open-meteo.com/v1/archive"
#: Nominatim search endpoint — the reference geocodes free text via
#: geopy's Nominatim client (server.py:96-119); this is the same public
#: HTTP API that client wraps.
GEOCODE_API_BASE = "https://nominatim.openstreetmap.org/search"
#: Nominatim's usage policy requires an identifying User-Agent (the
#: reference sends ``openmeteo_mcp_tool``, server.py:105)
GEOCODE_USER_AGENT = "wds-spark-engine/1.0"

Transport = Callable[[str, dict], tuple[int, str]]


def live_fetch_enabled() -> bool:
    """Live HTTP is opt-in: ``WDS_LIVE_FETCH=1`` in the environment."""
    return os.environ.get("WDS_LIVE_FETCH", "") == "1"


def _urllib_transport(url: str, params: dict) -> tuple[int, str]:
    """Default transport: stdlib urllib GET, 30 s timeout (the
    reference's client timeout, server.py:30).  Always sends an
    identifying User-Agent — Nominatim's usage policy rejects the
    urllib default."""
    full = url + "?" + urllib.parse.urlencode(params) if params else url
    req = urllib.request.Request(  # noqa: S310
        full, headers={"User-Agent": GEOCODE_USER_AGENT}
    )
    try:
        with urllib.request.urlopen(req, timeout=30.0) as resp:  # noqa: S310
            return resp.status, resp.read().decode("utf-8")
    except urllib.error.HTTPError as exc:  # remote answered with 4xx/5xx
        return exc.code, exc.read().decode("utf-8", errors="replace")
    except (urllib.error.URLError, TimeoutError, OSError) as exc:
        raise TransientFetchError(str(exc)) from exc


def fetch_json(
    url: str,
    params: dict,
    retry: RetryPolicy | None = None,
    limiter: RateLimiter | None = None,
    transport: Transport | None = None,
) -> dict | list:
    """GET + parse JSON under the reference's resilience envelope
    (Open-Meteo bodies are objects; Nominatim search bodies are
    arrays).

    Raises ``HttpStatusError`` (with parsed ``reason`` + raw body) on
    an error status, ``TransientFetchError`` after retries exhaust.
    When no transport is injected, requires ``WDS_LIVE_FETCH=1``.
    """
    if transport is None:
        if not live_fetch_enabled():
            raise RuntimeError(
                "live HTTP fetch is disabled; set WDS_LIVE_FETCH=1 to "
                "enable the urllib transport (or inject a transport)"
            )
        transport = _urllib_transport
    retry = retry or RetryPolicy()
    limiter = limiter or RateLimiter(min_delay=0.0)

    def attempt() -> dict:
        limiter.wait()
        status, body = transport(url, params)
        if status >= 400:
            reason = ""
            try:
                parsed = json.loads(body)
                reason = str(parsed.get("reason", ""))
            except (ValueError, AttributeError):
                pass
            raise HttpStatusError(status, reason=reason, body=body)
        return json.loads(body)

    return retry.call(attempt)


def fetch_forecast_document(
    latitude: float,
    longitude: float,
    hourly_vars: list[str],
    forecast_days: int | None = 7,
    past_days: int = 0,
    transport: Transport | None = None,
) -> dict:
    """One forecast request in the reference's wire shape
    (struct-of-arrays ``hourly`` block).

    Horizon params follow server.py:236-249 exactly: ``forecast_days``
    appears in the request only when the caller set it (clamped at 16)
    or when neither horizon was specified (7-day default injection);
    with only ``past_days`` set, the param is omitted and the
    upstream's own default applies."""
    params = {
        "latitude": latitude,
        "longitude": longitude,
        "hourly": ",".join(hourly_vars),
        "timezone": "auto",
    }
    from ..api.wrappers import resolve_horizon_params

    effective, present = resolve_horizon_params(forecast_days, past_days)
    if present:
        params["forecast_days"] = effective
    if past_days and past_days > 0:
        params["past_days"] = past_days  # server.py:243-246
    return fetch_json(FORECAST_API_BASE, params, transport=transport)


#: one shared throttle for ALL live geocode calls in the process —
#: the reference wraps its geocoder in
#: ``AsyncRateLimiter(min_delay_seconds=1.1)`` (server.py:108); a
#: per-call limiter would defeat the spacing, so the default lives at
#: module scope and tests inject their own.
_GEOCODE_LIMITER = RateLimiter(min_delay=1.1)


def geocode_place(
    place: str,
    transport: Transport | None = None,
    limiter: RateLimiter | None = None,
    retry: RetryPolicy | None = None,
) -> tuple[float, float]:
    """Free-text place → ``(latitude, longitude)`` via live Nominatim
    (reference server.py:96-119).

    Reference semantics reproduced exactly:

    - ``exactly_one=True``: request ``limit=1`` (what geopy sends for
      exactly-one) and take the FIRST hit if the remote returns more
      anyway — ambiguity resolves to the top-ranked match;
    - an empty hit list raises ``ValueError("Location '<x>' not
      found.")`` (server.py:112-114);
    - any transport/HTTP failure is coerced to
      ``ValueError("Failed to geocode '<x>': ...")`` — the reference's
      blanket except at server.py:116-119;
    - ≥ 1.1 s spacing between calls via the shared module limiter
      (server.py:108).

    When no transport is injected, requires ``WDS_LIVE_FETCH=1`` (the
    sandbox is offline); callers fall back to the static geo dimension
    before reaching here.
    """
    limiter = _GEOCODE_LIMITER if limiter is None else limiter
    params = {"q": place, "format": "jsonv2", "limit": 1}
    try:
        hits = fetch_json(
            GEOCODE_API_BASE, params,
            retry=retry, limiter=limiter, transport=transport,
        )
    except Exception as exc:
        raise ValueError(f"Failed to geocode '{place}': {exc}") from exc
    if not hits:
        raise ValueError(f"Location '{place}' not found.")
    top = hits[0]
    try:
        return float(top["lat"]), float(top["lon"])
    except (KeyError, TypeError, ValueError) as exc:
        raise ValueError(f"Failed to geocode '{place}': {exc}") from exc
