from .windows import session_agg, sliding_agg, tumbling_agg, with_watermark

__all__ = ["session_agg", "sliding_agg", "tumbling_agg", "with_watermark"]
