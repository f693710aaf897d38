from .explainer import (  # noqa: F401
    QueryLog,
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    formatted_plan,
    has_pushed_filters,
    observed,
    sortmerge_join_count,
)
