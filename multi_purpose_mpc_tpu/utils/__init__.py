"""Host-side utilities: asset loading, visualization, profiling, checkpointing."""
