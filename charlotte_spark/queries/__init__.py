"""Declared query modules; each registers into charlotte_spark.registry."""
