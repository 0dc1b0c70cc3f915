"""Column-level function library: text analysis + similarity search."""
