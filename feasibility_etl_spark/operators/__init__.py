from .joins import attach_detail, dim_join, lookup_or_insert
from .aggregates import horizontal_sum, linked_total, worklog_rollup

__all__ = [
    "attach_detail",
    "dim_join",
    "lookup_or_insert",
    "horizontal_sum",
    "linked_total",
    "worklog_rollup",
]
