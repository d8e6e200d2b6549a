from .io import load_table, make_save_mode, read_csv_with_schema, write_parquet  # noqa: F401
from .schemas import IRIS_SCHEMA, TABLE_SCHEMAS, TABLES  # noqa: F401
