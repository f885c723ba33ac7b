from .changelog import stream_changelog  # noqa: F401
