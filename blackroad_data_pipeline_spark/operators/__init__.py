"""Operator registry: name -> (df, config, views) -> df.

This registry replaces the reference's if/elif transform dispatch
(reference main.py:159-178) and *is* the extension surface the
reference lacks — registering a new operator is one decorator away.
"""

from .registry import OPERATORS, apply_operator, register  # noqa: F401
from . import relational  # noqa: F401  (registers core ops on import)
from . import temporal  # noqa: F401  (as-of / range joins)

# extension operators register on their packages' import; pull them in
# here so `apply_operator` always sees the complete registry (catalog-
# driven pipelines reference ops by name only)
from .. import llmops  # noqa: E402,F401
from ..streaming import ops as _streaming_ops  # noqa: E402,F401
