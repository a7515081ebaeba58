from aws_flight_data_pipeline_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    all_oracles,
    all_queries,
)

__all__ = ["REGISTRY", "QuerySpec", "all_oracles", "all_queries"]
