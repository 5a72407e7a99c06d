"""Query registry package.

Importing this package imports every query module, which registers each
query into ``registry.QUERIES`` via the ``@query`` decorator. The driver
contract (``__spark_entry__.py``) exposes exactly this registry.
"""

from incremental_dagster_delta_spark.queries.registry import QUERIES, QuerySpec, query, t

# Import for registration side effects — order defines registry order.
from incremental_dagster_delta_spark.queries import relational  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import reference_ops  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import text  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import dedup  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import similarity  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import events  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import multimodal_q  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import incremental_ops  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import advanced  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import formats  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import scale_patterns  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import sketches  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import relational_extra  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import analytics  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import training_prep  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import timeseries  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import modern  # noqa: E402,F401
from incremental_dagster_delta_spark.queries import cdc  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query", "t"]
