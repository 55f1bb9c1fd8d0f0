from .gates import DataLossExceeded, assert_loss_below, drop_failed, loss_report, validate_not_null

__all__ = [
    "DataLossExceeded",
    "assert_loss_below",
    "drop_failed",
    "loss_report",
    "validate_not_null",
]
