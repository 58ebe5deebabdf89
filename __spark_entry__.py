"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship ingest+analytics query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible query (same aliases, same
numeric policy — see warc_spark/queries.py docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Path: documents + lineitem-style relational agg is covered by queries();
    the flagship exercises the engine's reason-to-exist: synthesize
    Common-Crawl-style WARC records closed-form from the documents table,
    parse the bytes with the vectorized kernel, verify text byte-identity,
    aggregate per source/lang (oracle-checked end to end since r5).
    """
    from warc_spark.plans.session import _ship_package
    from warc_spark.queries import queries as _q

    _ship_package(spark)
    return _q()["warc_parse_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from warc_spark.plans.session import _ship_package
    from warc_spark.queries import queries as _q

    base = _q()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)  # driver may pass its own session
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    from warc_spark.queries import oracle_sql as _o

    return _o()
