"""Structured Streaming surface (SURVEY.md §2.9).

The reference's streaming concerns — hourly tumbling fetch loops
(/root/reference/getRJWData.py:141-146), scraped 24h/8h sliding averages
(/root/reference/getRJWData.py:16-24), barrier micro-batches
(/root/reference/suplicmap_vector2.py:117-123) — formalized as
readStream → window agg → writeStream with watermarks.
"""

from spider_spark.streaming.joins import (  # noqa: F401
    attributed_conversions,
)
from spider_spark.streaming.schedule_stream import (  # noqa: F401
    current_schedule,
    run_schedule_stream,
)
from spider_spark.streaming.windows import (  # noqa: F401
    dedup_events_stream,
    session_counts_stream,
    sliding_avg_stream,
    tumbling_counts_stream,
)
