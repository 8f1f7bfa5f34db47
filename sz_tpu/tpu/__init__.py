"""TPU-native (JAX/XLA) compute engine for sz_tpu."""
