"""Utilities: timing, verification, PRNG parity, native bindings."""
