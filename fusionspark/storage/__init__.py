"""Table storage layers: the default plain-parquet layout (engine.py) and
the manifest-commit table for concurrent writers (storage/manifest.py)."""

from fusionspark.storage.manifest import ManifestTable

__all__ = ["ManifestTable"]
