"""Production pipeline patterns: idempotent partitioned backfills."""
