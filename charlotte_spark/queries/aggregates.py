"""Placeholder — queries land in a later phase of this round."""
