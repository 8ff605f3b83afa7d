"""Storage backends: in-memory and SQLite, one IStorageProvider contract."""
