"""Function library.

The reference's entire scalar-function surface is one builtin,
``cosine_distance(vector, vector)`` (andb/catalog/buitin_functions.py:3-12),
behind a catalog that declares-but-never-implements user-defined functions
(andb/catalog/function.py:14-136). Here the builtin library is
``pyspark.sql.functions`` (hundreds of JVM-side codegen'd functions, free)
plus the modules below; ``register.register_all`` exposes the extras to
the SQL entry point, which is the Spark analog of the reference's
``andb_function`` catalog.
"""

from andb_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot,
    l2_norm,
)
from andb_spark.functions.register import register_all

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "register_all",
]
