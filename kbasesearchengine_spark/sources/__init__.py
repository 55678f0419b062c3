"""Sources/sinks: corpus scan + index table catalog."""
