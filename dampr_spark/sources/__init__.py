from dampr_spark.sources.readers import TABLES, load_tables, read_table

__all__ = ["TABLES", "load_tables", "read_table"]
