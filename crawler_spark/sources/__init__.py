"""Input sources that land external data in the engine's table shapes."""

from crawler_spark.sources.warc import (  # noqa: F401
    export_warc,
    latest_captures,
    read_warc,
    write_warc,
)
