from geo_db_spark.operators.relational import (  # noqa: F401
    anti_join,
    argmin_per_group,
    dedup_by_key,
    join_replace_column,
    ordered_group_concat,
    prioritized_pick,
    semi_join,
    top_k_per_group,
)
from geo_db_spark.operators.closure import transitive_closure, deepest_qualifying_ancestor  # noqa: F401
