"""Cross-cutting utilities (reference include/debug.h, misc headers)."""
