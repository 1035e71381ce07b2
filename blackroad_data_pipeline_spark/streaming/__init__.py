from . import ops  # noqa: F401  (registers streaming-capable ops)
