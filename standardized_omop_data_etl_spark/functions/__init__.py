from . import conventions, scalars, text_analysis  # noqa: F401
