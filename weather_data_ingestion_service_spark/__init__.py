"""PySpark-native analytics engine with the query/data-processing
capabilities of ``martin07701804/Weather-data-ingestion-service``.

The reference (see ``SURVEY.md``) is an MCP stdio service that delegates
scan/filter/resample/aggregate work to the remote Open-Meteo API
(reference server.py:142-280, 284-369). This engine re-expresses those
semantics — plus the mandated large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) — natively on the Spark DataFrame/SQL/Catalyst stack.

Layout
------
- ``session``    SparkSession builder + engine confs (UTC, AQE, Arrow)
- ``io``         Parquet readers for the synthetic test tables
- ``schemas``    StructTypes + the reference's variable catalog
- ``operators``  relational operator library (filters, joins, aggs,
                 windows, set ops, as-of join)
- ``functions``  scalar function library incl. solar astronomy UDF
- ``sources``    batch/offline source adapters (forecast/history/geocode)
- ``api``        reference-parity entry points: get_forecast/get_history
- ``streaming``  Structured Streaming jobs (triggers, watermarks, upsert)
- ``ext``        mandated extensions: dedup, simsearch, text, multimodal
- ``plans``      plan inspection / optimization assertions
- ``registry``   the driver-facing ``queries()`` / ``oracle_sql()`` maps
"""

__version__ = "0.1.0"
