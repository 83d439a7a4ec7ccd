"""Streaming live views (upsert cache, TTL, lambda merge)."""

from .live_view import (  # noqa: F401
    expire_ttl,
    foreach_batch_upsert,
    live_view,
    merged_view,
    stateful_live_view,
)
from .cohorts import cohort_table_from_deltas, streaming_cohort_deltas  # noqa: F401
from .density import streaming_cell_density  # noqa: F401
from .funnel import streaming_funnel  # noqa: F401
from .sessions import streaming_sessionize  # noqa: F401
