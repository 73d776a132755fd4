from .delta_export import export_delta_log, read_delta_snapshot
from .ingest import ensure_ingested, managed_path

__all__ = [
    "ensure_ingested",
    "export_delta_log",
    "managed_path",
    "read_delta_snapshot",
]
