"""Graph and data-pipeline operators (DataFrame-first)."""
