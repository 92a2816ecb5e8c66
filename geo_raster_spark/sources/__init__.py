"""Sources & sinks (SURVEY.md §2.1): tabular scans, catalogs, id parsers."""
