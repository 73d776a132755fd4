from .inspect import (
    formatted_plan,
    has_broadcast_join,
    is_python_free,
    pushed_filters,
    simple_plan,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "is_python_free",
    "pushed_filters",
    "simple_plan",
]
