"""Sources & sinks (SURVEY.md §2.1): JSON flatten scans, multi-file
union scans with filename-derived typing, parquet warehouse IO, and a
pluggable paginated-fetch source abstraction."""
