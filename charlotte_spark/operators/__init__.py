"""Composite operators the DataFrame API lacks as single calls."""
