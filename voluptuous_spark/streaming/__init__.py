from .validate_stream import validate_stream, streaming_report  # noqa: F401
