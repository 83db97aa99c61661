from .time_utils import convert_time_to_readable_format

__all__ = ["convert_time_to_readable_format"]
