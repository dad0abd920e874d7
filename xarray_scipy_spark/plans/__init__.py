from .layout import to_long, to_series

__all__ = ["to_series", "to_long"]
