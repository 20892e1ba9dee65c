"""Reference-parity entry points (SURVEY.md §3): ``get_forecast``,
``get_history``, ``geocode`` — the engine's analog of the reference's
two MCP tools (reference server.py:142, 284) and its geocoding helper
(server.py:96-119)."""

from .wrappers import ForecastRequestError, geocode, get_forecast, get_history  # noqa: F401
