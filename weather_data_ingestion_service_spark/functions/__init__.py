"""Scalar function library (SURVEY.md §2.H).

Nearly every reference scalar maps to a Spark built-in (see
``registry.py`` f_* entries); this package holds the one genuinely
custom function family — solar astronomy (``astro``), the engine-side
computation of the API-computed ``sunrise``/``sunset``/
``daylight_duration`` daily variables (reference server.py:133).
"""

from .astro import solar_events  # noqa: F401
