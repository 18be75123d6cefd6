"""Table sources: deterministic synthesis + Iceberg-style partitioned IO."""
