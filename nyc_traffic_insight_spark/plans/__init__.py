from nyc_traffic_insight_spark.plans.flagship import flagship_volume_features

__all__ = ["flagship_volume_features"]
