"""Mail dumpers: mailbox exports -> .eml files for ingest_email."""
