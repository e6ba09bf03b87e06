"""Aggregates the named-query registry from all operator modules.

Importing this module populates ``REGISTRY`` (see registry.py).  The driver
contract (__spark_entry__.py) re-exports from here.
"""

from __future__ import annotations

from .registry import REGISTRY, Query  # noqa: F401

# Import order = SURVEY.md §7 milestone order; each import registers queries.
from .operators import relational  # noqa: F401, E402

try:  # modules added milestone by milestone
    from .operators import temporal  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .functions import prices as _prices_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import textops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import dedup  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import similarity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import segmentation  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import inference  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import pipeline_native  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import preferences  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import scalars_extra  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import curation  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .sources import binary  # noqa: F401  (multimodal_features)
except ImportError:  # pragma: no cover
    pass
try:
    from .streaming import revalidate  # noqa: F401
except ImportError:  # pragma: no cover
    pass


def queries():
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
