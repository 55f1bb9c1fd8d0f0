from .feasibility_view import faithful_view_sql, idiomatic_view
from .pipeline import transform_feasibilities

__all__ = ["faithful_view_sql", "idiomatic_view", "transform_feasibilities"]
