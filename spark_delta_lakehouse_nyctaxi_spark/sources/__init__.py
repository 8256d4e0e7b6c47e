from .readers import TABLES, load_star, load_table, read_csv, read_parquet

__all__ = ["TABLES", "load_star", "load_table", "read_csv", "read_parquet"]
