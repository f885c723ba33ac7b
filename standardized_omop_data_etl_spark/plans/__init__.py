from .merge import MergeResult, densify_sparse_batch, merge_into  # noqa: F401
from .replay import replay_log, replay_files  # noqa: F401
