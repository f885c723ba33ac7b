from .changelog import stream_changelog, stream_changelog_from  # noqa: F401
from .stateful import compact_changelog_stream  # noqa: F401
from .windowed import windowed_event_counts  # noqa: F401
