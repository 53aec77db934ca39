"""Declared-query registry: every certified operator lives here.

Importing this package populates the registry from all query modules;
``__spark_entry__.py`` exposes it to the driver.
"""

from sparkstreamingflume_spark.plans.registry import (  # noqa: F401
    CERT_WINDOW,
    REGISTRY,
    Query,
    primary_queries,
    query,
    window_queries,
)

# Import for registration side effects. Relational first: the driver
# certifies queries() in registration order (at most 50 per round), so
# the queries that have never had a driver row yet come earliest.
from sparkstreamingflume_spark.plans import relational_queries  # noqa: E402,F401
from sparkstreamingflume_spark.plans import extension_queries  # noqa: E402,F401
from sparkstreamingflume_spark.plans import core_queries  # noqa: E402,F401
