"""Query planning / API facade layer."""
