from .fs import FileSystem, LocalFileSystem  # noqa: F401
from .lake import (  # noqa: F401
    ConcurrentWriterError,
    LakeTable,
    SchemaEvolutionError,
    TableFormatError,
)
