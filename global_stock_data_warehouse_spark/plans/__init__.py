"""Composed pipelines ("plans"): end-to-end jobs built from operators/."""

from global_stock_data_warehouse_spark.plans.wmy import wmy_pipeline  # noqa: F401
