"""Pinned HTML→text extractor (EXTRACTOR_VERSION = 1).

The `input_hint` contract requires *byte-identical extracted text per
url*. This module is the single source of truth: the fixture generator
calls :func:`extract_text` to mint the ``text`` column, and the engine
re-extracts from ``html`` with either the same Python function
(vectorized, Arrow-batched) or the pure-JVM column expression
:func:`extract_text_col` — tests assert all three agree byte-for-byte
on every row.

Pinned rules (v1):
  * decode bytes as strict UTF-8
  * title   = first ``<title>...</title>`` match (non-greedy, DOTALL off)
  * paras   = every ``<p>...</p>`` match, in document order
  * text    = "\n".join([title] + paras); missing title contributes ""
  * no entity decoding, no whitespace normalization (generator emits
    entity-free markup — documented in fixtures/webtext.py)

Reference parity: the reference has no extractor (pure vector data,
/root/reference/src/worst_case_implementation.py:13-18); this is the
target-domain analog of its fixed ingest schema, pinned so the
byte-identity invariant is testable.
"""

from __future__ import annotations

import re

import pandas as pd

TITLE_RE = re.compile(r"<title>(.*?)</title>")
PARA_RE = re.compile(r"<p>(.*?)</p>")


def extract_text(html: bytes) -> str:
    """Scalar pinned extractor: html bytes → text."""
    s = html.decode("utf-8")
    m = TITLE_RE.search(s)
    title = m.group(1) if m else ""
    paras = PARA_RE.findall(s)
    return "\n".join([title] + paras)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized form for Arrow-batched pandas UDFs (no per-row Python
    at the Spark API layer; the loop here runs inside one Arrow batch)."""
    return html.map(extract_text)


def extract_text_col(html_col):
    """Pure-JVM equivalent as a Column expression (stays inside
    whole-stage codegen; preferred in the hot ingest path).

    Must produce byte-identical output to :func:`extract_text` for all
    generator-emitted HTML; asserted in tests/test_extractor.py.
    """
    from pyspark.sql import functions as F

    s = html_col.cast("string")  # binary → UTF-8 string
    title = F.regexp_extract(s, "<title>(.*?)</title>", 1)
    paras = F.regexp_extract_all(s, F.lit("<p>(.*?)</p>"), 1)
    return F.concat_ws("\n", F.concat(F.array(title), paras))
