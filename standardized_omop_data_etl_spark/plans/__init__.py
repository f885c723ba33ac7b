from .merge import MergeResult, merge_into  # noqa: F401
from .replay import replay_log, replay_files  # noqa: F401
