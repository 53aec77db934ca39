"""Declared-query registry: every certified operator lives here.

Importing this package populates the registry from all query modules;
``__spark_entry__.py`` exposes it to the driver.
"""

from sparkstreamingflume_spark.plans.registry import REGISTRY, Query, query  # noqa: F401

# Import for registration side effects.
from sparkstreamingflume_spark.plans import core_queries  # noqa: E402,F401
from sparkstreamingflume_spark.plans import extension_queries  # noqa: E402,F401
from sparkstreamingflume_spark.plans import relational_queries  # noqa: E402,F401
