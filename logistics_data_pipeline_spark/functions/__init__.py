from .core import (
    surrogate_key,
    surrogate_key_sql,
    dow_sunday0,
    nullif_zero,
    try_to_timestamp,
    try_to_date,
)

__all__ = [
    "surrogate_key",
    "surrogate_key_sql",
    "dow_sunday0",
    "nullif_zero",
    "try_to_timestamp",
    "try_to_date",
]
