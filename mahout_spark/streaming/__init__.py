"""Streaming: incremental sketch maintenance over Structured Streaming."""

from mahout_spark.streaming.incremental import (incremental_sketch_stream,
                                                read_sketch_store)

__all__ = ["incremental_sketch_stream", "read_sketch_store"]
