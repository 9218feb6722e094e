from .tables import TABLES, candles_from_events, load_table

__all__ = ["TABLES", "load_table", "candles_from_events"]
