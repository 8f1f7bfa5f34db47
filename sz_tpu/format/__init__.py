"""Byte-level container format, bit-exact with the reference SZ2 streams."""
