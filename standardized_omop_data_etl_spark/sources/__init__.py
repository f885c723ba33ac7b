from .lake import LakeTable, SchemaEvolutionError  # noqa: F401
