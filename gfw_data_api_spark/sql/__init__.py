"""The guarded read-only single-table SQL dialect.

Reference parity: app/routes/datasets/utils/query_helpers.py (validation
matrix + FROM rewrite + spatial-filter injection), app/models/enum/
pg_admin_functions.py and pg_sys_functions.py (function denylist).
"""

from gfw_data_api_spark.sql.guard import QueryGuardError, scrutinize_sql, validate_sql

__all__ = ["QueryGuardError", "scrutinize_sql", "validate_sql"]
