from .storage import StorageCatalog, load_metadata, commit_metadata  # noqa: F401
