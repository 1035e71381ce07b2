from .readers import SOURCES, read_source  # noqa: F401
