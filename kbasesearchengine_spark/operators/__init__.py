"""Engine operators: index build/merge, top-k query, dedup, ANN, text stats."""
