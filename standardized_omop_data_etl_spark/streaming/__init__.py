from .changelog import stream_changelog  # noqa: F401
from .windowed import windowed_event_counts  # noqa: F401
