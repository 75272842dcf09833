"""Structured Streaming components: sources, harness, sequencer, pipeline."""
