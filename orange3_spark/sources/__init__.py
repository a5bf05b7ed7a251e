from orange3_spark.sources.registry import read_table  # noqa: F401
