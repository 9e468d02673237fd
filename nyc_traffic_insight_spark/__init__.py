"""NYC-Traffic-Insight, re-built PySpark-native.

A standalone analytics engine with the query and data-processing
capabilities of the reference repo (nokonkwo-jpg/NYC-Traffic-Insight — a
pandas + scikit-learn batch pipeline), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; we don't hand-schedule)
- explicit schemas everywhere (the reference's schema inference is its #1
  fragility; see SURVEY.md §1)
- built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only where
  the semantics genuinely require Python (CRS reprojection)
- MLlib pipelines for the model surface
- Structured Streaming for the event-stream slice the reference lacks

Layout (SURVEY.md §7):
- ``sources``    — scans & sinks (S1–S12)
- ``operators``  — relational ops: projections, filters, joins, sets,
                   aggregates, windows, sampling, plus large-scale
                   training-data ops (dedup, similarity, text)
- ``functions``  — scalar expression library (C1–C17) and metric aggs
- ``plans``      — composed end-to-end pipelines (the reference's "queries")
- ``ml``         — MLlib pipelines (M1–M9)
- ``streaming``  — Structured Streaming slices
- ``queries``    — driver-facing catalog: every operator as a (Spark
                   DataFrame builder, DuckDB oracle SQL) pair
"""

__version__ = "0.1.0"
