from .dedup_gate import gate_batch, near_dup_gate_sink
from .windows import session_agg, sliding_agg, tumbling_agg, with_watermark

__all__ = [
    "gate_batch",
    "near_dup_gate_sink",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
    "with_watermark",
]
