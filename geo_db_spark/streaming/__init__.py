from geo_db_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    sessionize_stateful,
    windowed_event_counts,
)
