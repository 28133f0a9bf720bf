from geo_db_spark.streaming.jobs import (  # noqa: F401
    click_impression_stream_join,
    enrich_stream_with_dim,
    maintain_windowed_rollup,
    purchase_click_stream_join,
    rate_limit_dedup,
    read_events_stream,
    sessionize_builtin,
    sessionize_stateful,
    windowed_event_counts,
)
from geo_db_spark.streaming.telemetry import IngestTicker, attach_ticker  # noqa: F401
