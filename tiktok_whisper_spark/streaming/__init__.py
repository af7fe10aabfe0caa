"""Job-state management + Structured Streaming ingestion."""
