"""Sources: corpus synthesis + readers."""
