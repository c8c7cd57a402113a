"""Input sources that land external data in the engine's table shapes."""

from crawler_spark.sources.warc import read_warc, write_warc  # noqa: F401
