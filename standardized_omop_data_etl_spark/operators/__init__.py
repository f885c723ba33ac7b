from .lww import lww_latest, priority_dedup  # noqa: F401
