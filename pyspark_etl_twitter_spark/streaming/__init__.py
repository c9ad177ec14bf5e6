from pyspark_etl_twitter_spark.streaming.pipeline import (
    replay_to_json,
    score_stream_foreach_batch,
    stream_documents,
    stream_events,
)
from pyspark_etl_twitter_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "replay_to_json",
    "score_stream_foreach_batch",
    "stream_documents",
    "stream_events",
    "session_counts",
    "sliding_counts",
    "streaming_dedup",
    "tumbling_counts",
]
