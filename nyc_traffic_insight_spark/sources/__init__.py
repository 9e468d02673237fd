from nyc_traffic_insight_spark.sources.catalog import load_table, load_tables

__all__ = ["load_table", "load_tables"]
