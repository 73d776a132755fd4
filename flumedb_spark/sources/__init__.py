from .ingest import ensure_ingested, managed_path

__all__ = ["ensure_ingested", "managed_path"]
