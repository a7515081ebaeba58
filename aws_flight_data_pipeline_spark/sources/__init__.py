from aws_flight_data_pipeline_spark.sources.testdata import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
