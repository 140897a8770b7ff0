"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-polygon spatial join at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every oracle-checked
operator (see gis_shapefile_spark/entry_queries.py for the determinism
design: integer cell math, integerized float aggregates, identical SQL
text across Spark and DuckDB where possible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gis_shapefile_spark import entry_queries as EQ  # noqa: E402
from gis_shapefile_spark import entry_queries_pipeline as EQP  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return EQ.q_pip_grid_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**EQ.QUERIES, **EQP.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**EQ.ORACLES, **EQP.ORACLES}
