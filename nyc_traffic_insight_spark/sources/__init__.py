from nyc_traffic_insight_spark.sources.catalog import load_table, load_tables
from nyc_traffic_insight_spark.sources.objectstore import load_object_store

__all__ = ["load_table", "load_tables", "load_object_store"]
