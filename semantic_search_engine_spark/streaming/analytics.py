"""Event-time streaming analytics: watermarked windowed aggregation.

The ingest half of the streaming surface (micro-batch index
generations) lives in :mod:`.ingest`; this is the analytics half the
events table needs at stream time — the Structured Streaming
``withWatermark`` + ``window`` shape, where LATE data has a pinned,
deterministic contract instead of silently skewing counts:

  * a watermark of ``delay`` trails the max event time seen, advancing
    at micro-batch boundaries;
  * rows older than the watermark are DROPPED (the batch twin
    ``q_events_daily`` counts them — streaming trades completeness for
    bounded state, and the delay is the knob);
  * in append mode a window emits EXACTLY ONCE, when the watermark
    passes its end — downstream sinks never see a partial window
    revised.

At 100 TB/day of events this is the only shape that works: state is
bounded by (windows within the watermark horizon × keys), not by
stream length, and the shuffle per micro-batch carries partial
aggregates, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    stream: DataFrame,
    window_len: str = "1 day",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of the batch ``events_daily`` aggregation:
    (window_start, window_end, key, n, sum_value) per event-time
    window and key, under a ``watermark_delay`` late-data horizon.
    The aggregation expressions match the batch entry exactly (count +
    decimal-summed value rounded to 2), so for an input with no
    dropped-late rows the emitted windows equal the batch groupBy —
    and with late rows, they equal the batch groupBy over the
    non-dropped subset (both pytest-asserted)."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_len).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            F.col("n"),
            F.col("sum_value"),
        )
    )
