from duckdb_pst_spark.functions import portable, vectors  # noqa: F401
