from masd_spark.sources.tables import TABLE_SCHEMAS, load_table, register_views

__all__ = ["TABLE_SCHEMAS", "load_table", "register_views"]
