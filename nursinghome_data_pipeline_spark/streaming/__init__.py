from .ingest_stream import stream_csv_ingest, windowed_event_aggregates  # noqa: F401
