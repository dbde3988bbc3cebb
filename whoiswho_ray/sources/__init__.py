"""Sources / sinks."""
