from geo_db_spark.operators.relational import (  # noqa: F401
    anti_join,
    argmin_per_group,
    dedup_by_key,
    join_replace_column,
    ordered_group_concat,
    prioritized_pick,
    salted_join,
    semi_join,
    top_k_per_group,
)
from geo_db_spark.operators.closure import (  # noqa: F401
    deepest_qualifying_ancestor,
    transitive_closure,
    transitive_closure_loop,
)
from geo_db_spark.operators.components import connected_components  # noqa: F401
from geo_db_spark.operators.rangejoin import bucketed_range_join  # noqa: F401
