"""Data pipelines: synthetic voice corpus + host-side batch loaders."""
