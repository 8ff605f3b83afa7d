"""Command-line tools: query REPL, ingestion, snapshot loading, benchmarks."""
