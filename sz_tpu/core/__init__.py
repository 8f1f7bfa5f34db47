"""Core lossy codec: prediction + quantization + escape handling."""
