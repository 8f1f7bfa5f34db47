"""Application-specific codecs (exafelSZ; PaSTRI planned)."""
