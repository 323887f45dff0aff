"""peri_spark — a PySpark-native declarative schema + constraint validation
engine, built from scratch with the capabilities of zoedsoupe/peri
(reference studied at /root/reference; semantics cited per-module).

Peri validates one record at a time in Elixir; peri_spark compiles the same
schema DSL into vectorized Spark SQL predicates evaluated over whole
DataFrames — one codegen'd projection pass for row-level rules, plus
table-level constraint stages (column stats, salted uniqueness, referential
anti-joins, distribution drift) that Peri doesn't have but a 10^12-file
validation pipeline needs.
"""

from .compiler import ErrorRef
from .dsl import (ColFn, Expr, PandasFn, defschema, get_schema,
                  schema_registry, validate_schema, validate_schema_errors)
from .engine import ValidationResult, conforms, validate, validate_column
from .errors import InvalidSchemaError, SchemaError, traverse_errors

__all__ = [
    "validate", "validate_column", "conforms", "ValidationResult",
    "validate_schema", "validate_schema_errors", "defschema", "get_schema",
    "schema_registry", "Expr", "ColFn", "PandasFn", "ErrorRef",
    "InvalidSchemaError", "SchemaError", "traverse_errors",
]

__version__ = "0.1.0"
