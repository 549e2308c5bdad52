from .validate_stream import (  # noqa: F401
    stateful_duplicate_flags,
    streaming_report,
    validate_stream,
)
