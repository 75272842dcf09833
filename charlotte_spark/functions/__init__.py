"""Engine function library (portable rounding, hashing, net, text, vectors)."""
