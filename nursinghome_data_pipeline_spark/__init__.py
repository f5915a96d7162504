"""PySpark-native analytics engine with the query and data-processing
capabilities of ``techninja828/nursinghome-data-pipeline``.

The reference (at /root/reference, snapshot 2025-08-24) is a single-node
pandas + SQLite ETL pipeline: config-driven CSV ingest -> staging ->
curated fact tables/views -> staffing metrics -> interactive queries.
This package re-expresses every operator in that pipeline (SURVEY.md §2)
as idiomatic Spark DataFrame/SQL plans, plus the LLM-data-pipeline
extension operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout:
    session         SparkSession builder with pinned semantics configs
    sources/        CSV glob ingest (config-driven) + parquet star-schema loader
    catalog         staging tables, CTAS, views, catalog listing
    dq              duplicate-key audit, completeness profiling, audit log
    pipelines/      penalties build pipeline; staffing metrics pipeline
    query_layer     interactive filter/group/pivot/profile operators
    functions/      text + vector column expression builders
    operators/      dedup, similarity search, multimodal plumbing
    streaming/      file-source streaming ingest with windowed DQ aggs
    registry        named queries + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
