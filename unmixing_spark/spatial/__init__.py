from unmixing_spark.spatial.grid import GridSpec, WORLD_GRID  # noqa: F401
