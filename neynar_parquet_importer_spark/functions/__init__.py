from .json_clean import clean_json_columns, clean_jsonb_string, parse_json_column
from .scalars import hex0x, epoch_seconds_to_ts, window_start

__all__ = [
    "clean_json_columns",
    "clean_jsonb_string",
    "parse_json_column",
    "hex0x",
    "epoch_seconds_to_ts",
    "window_start",
]
