from . import scalars, text_analysis  # noqa: F401
