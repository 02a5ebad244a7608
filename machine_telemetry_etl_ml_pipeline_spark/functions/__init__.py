from .timefeat import with_time_features, with_write_defaults

__all__ = ["with_time_features", "with_write_defaults"]
