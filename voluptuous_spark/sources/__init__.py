from .catalog import Source, Sink, load_table  # noqa: F401
