"""External-format integrations (HDF5 filter equivalent, readers)."""
