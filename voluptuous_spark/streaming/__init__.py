from .validate_stream import (  # noqa: F401
    reference_bucket_probs,
    stateful_duplicate_flags,
    streaming_numeric_psi,
    streaming_report,
    validate_stream,
)
