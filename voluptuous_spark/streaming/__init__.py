from .validate_stream import (  # noqa: F401
    merged_stream_stats,
    reference_bucket_probs,
    stateful_duplicate_flags,
    streaming_embedding_psi,
    streaming_numeric_psi,
    streaming_report,
    streaming_sketch_sink,
    validate_stream,
)
