"""Structured Streaming surface: incremental extraction over arriving
page files with stateful dedup and checkpoint resume."""
