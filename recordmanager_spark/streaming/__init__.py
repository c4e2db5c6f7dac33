from .pipeline import incremental_run, streaming_events

__all__ = ["incremental_run", "streaming_events"]
