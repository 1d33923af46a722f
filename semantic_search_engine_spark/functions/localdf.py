"""Arrow-backed local DataFrames for small driver-side relations.

``spark.createDataFrame(list_of_tuples, schema)`` routes through
``parallelize`` → pickled RDD rows → one Python-worker task per slice:
on this host a 32-row manifest frame costs ~2 s to collect and ~4-6 s
to write (measured, OPTIMIZATION_r08.md §build). The pandas input path
is Arrow-converted in-process and plans as a JVM LocalTableScan —
~0.03 s for the same rows. Every tiny driver-side relation (query-term
frames, probe buckets, cf maps, manifest rows) should take this path;
this helper keeps the call sites one-line.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _ddl_col_names(schema: str) -> list[str]:
    # "qid int, k int, term string" -> ["qid", "k", "term"]; flat DDL
    # only (no nested struct/array types — none of the call sites use
    # them; a comma inside a type would split wrong, so guard loudly)
    if "<" in schema or "(" in schema:
        raise ValueError(f"local_df needs a flat DDL schema, got {schema!r}")
    return [re.split(r"\s+", part.strip(), maxsplit=1)[0] for part in schema.split(",")]


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """A DataFrame over small driver-local rows (list of tuples) with a
    DDL ``schema``, built through the Arrow/pandas conversion path so
    the plan is a LocalTableScan — no parallelize, no Python-worker
    tasks. Intended for bounded relations (query plans, probe keys,
    stats rows), not data."""
    if not rows:
        return spark.createDataFrame([], schema)
    cols = _ddl_col_names(schema)
    pdf = pd.DataFrame.from_records(list(rows), columns=cols)
    # object columns holding None must stay None (not NaN) for Arrow
    return spark.createDataFrame(pdf, schema=schema)
