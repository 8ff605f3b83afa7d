"""The Structured-RAG engine: data model, indexes, ingestion, query pipeline."""
